"""HBM-footprint table for spatial partitioning (--spatial_devices).

Answers, with XLA's own numbers, the question the feature exists for
(parallel/mesh.py: "geometries too large for one chip's HBM"): how do the
per-device memory requirements of the fused MCD train step scale with the
'space' mesh extent, and which real configs actually need it?

Two modes:

  * ``--mode spatial`` (default; any backend — run with
    ``JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8``
    for the virtual 8-device mesh): for each spatial extent s, build the
    Mesh((n/s, s), ('data','space')) step at the MINIMUM global batch the
    mesh admits (one image per 'data' row — the regime data parallelism
    cannot enter: per-device activations are 1/s of an image), AOT-compile
    it from ShapeDtypeStructs (nothing is materialized), and print
    ``compiled.memory_analysis()`` per-device bytes.

  * ``--mode fit`` (run on the real chip): single-device batch sweep at a
    geometry — AOT-compile the step at increasing per-chip batch and report
    argument/temp bytes until the compiler's own numbers cross the HBM
    capacity, locating the fit/OOM boundary without crashing a run.

The numbers feed docs/ARCHITECTURE.md's spatial-partitioning envelope
(VERDICT r4 #5). No reference counterpart exists (the reference is
single-GPU, SURVEY.md section 2); this is TPU-native capacity planning.
"""

from __future__ import annotations

import argparse
import functools
import json


def _build_lowered(mesh, w, h, batch, num_k=1, net="drn_d_38",
                   dtype="bfloat16", spatial=1):
    """AOT-lower the fused preprocess+MCD step on ``mesh`` from shape
    structs only — no arrays materialize, so megapixel geometries lower in
    seconds on any host."""
    import jax
    import jax.numpy as jnp

    from mcseg_tpu.core.config import DataConfig, ModelConfig, TrainConfig
    from mcseg_tpu.data.labels import get_label_spec
    from mcseg_tpu.models.factory import get_models
    from mcseg_tpu.ops.preprocess import host_table, make_train_preprocess
    from mcseg_tpu.parallel.mesh import (
        batch_sharding,
        constrain_spatial,
        replicated_sharding,
    )
    from mcseg_tpu.train.mcd import make_mcd_step
    from mcseg_tpu.train.state import create_train_state

    model_cfg = ModelConfig(net=net, input_ch=6, n_class=40, dtype=dtype)
    data_cfg = DataConfig(src_dataset="suncg", tgt_dataset="nyu",
                          batch_size=batch, train_img_shape=(w, h),
                          input_ch=6)
    train_cfg = TrainConfig(lr=1e-3, num_k=num_k, max_steps=100_000)

    # init at a tiny geometry: conv params are geometry-independent
    state, tx_g, tx_f = create_train_state(
        model_cfg, train_cfg, jax.random.key(0), img_shape=(16, 16))
    g, f1, f2 = get_models(model_cfg)
    pp = make_train_preprocess(data_cfg, compute_dtype=jnp.bfloat16
                               if dtype == "bfloat16" else None)
    _, tgt_remap, _, _ = get_label_spec("nyu")
    tgt_remap = host_table(tgt_remap)
    inner = make_mcd_step(g, f1, f2, tx_g, tx_f, train_cfg)
    data_key = jax.random.key(1)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def full_step(state, src_raw, tgt_raw):
        key = jax.random.fold_in(data_key, state.step)
        k_src, k_tgt = jax.random.split(key)
        xs, ys = pp(src_raw, k_src)
        xt, _ = pp(tgt_raw, k_tgt, remap_table=tgt_remap)
        if spatial > 1:
            xs, ys, xt = (constrain_spatial(mesh, v) for v in (xs, ys, xt))
        return inner(state, xs, ys, xt)

    bsh, rsh = batch_sharding(mesh), replicated_sharding(mesh)
    state_s = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=rsh), state)

    def wire(drop_label):
        d = {"image": jax.ShapeDtypeStruct((batch, h, w, 3), jnp.uint8,
                                           sharding=bsh),
             "depth": jax.ShapeDtypeStruct((batch, h, w), jnp.uint16,
                                           sharding=bsh)}
        if not drop_label:
            d["label"] = jax.ShapeDtypeStruct((batch, h, w), jnp.uint8,
                                              sharding=bsh)
        return d

    return full_step.lower(state_s, wire(False), wire(True))


def _mem_row(lowered):
    c = lowered.compile()
    m = c.memory_analysis()
    if m is None:
        return None
    keys = ("argument_size_in_bytes", "output_size_in_bytes",
            "temp_size_in_bytes", "generated_code_size_in_bytes")
    return {k.replace("_in_bytes", "_mb"): round(getattr(m, k, 0) / 2**20, 1)
            for k in keys}


def run_spatial(w: int, h: int, n_devices: int, net: str, num_k: int):
    from mcseg_tpu.parallel.mesh import make_mesh

    rows = {}
    s = 1
    while s <= n_devices:
        if n_devices % s:
            s *= 2  # extent doesn't divide the mesh (non-power-of-two n)
            continue
        # minimum global batch the mesh admits: one image per 'data' row —
        # per-device activations are 1/s of one image's
        batch = max(n_devices // s, 1)
        mesh = make_mesh(n_devices, spatial=s)
        low = _build_lowered(mesh, w, h, batch, num_k=num_k, net=net,
                             spatial=s)
        row = _mem_row(low)
        rows[f"spatial={s}"] = {
            "mesh": f"{n_devices // s}x{s} data-x-space",
            "global_batch": batch,
            "image_rows_per_device": h // s,
            **(row or {"memory_analysis": "unavailable on this backend"}),
        }
        print(json.dumps({f"{w}x{h} {net} spatial={s}": rows[f"spatial={s}"]}),
              flush=True)
        s *= 2
    return rows


def run_fit(w: int, h: int, net: str, num_k: int, batches, hbm_gb: float):
    from mcseg_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(1)
    rows = {}
    for b in batches:
        low = _build_lowered(mesh, w, h, b, num_k=num_k, net=net)
        try:
            row = _mem_row(low)
        except Exception as e:  # XLA OOMs at COMPILE time past the boundary
            msg = str(e)
            key = "Ran out of memory in memory space hbm"
            row = {"fits": False,
                   "compile_error": (msg[msg.index(key):][:120]
                                     if key in msg else msg[-160:])}
            rows[f"batch={b}"] = row
            print(json.dumps({f"{w}x{h} {net} batch={b}": row}), flush=True)
            continue
        if row is None:
            rows[f"batch={b}"] = {"memory_analysis": "unavailable"}
            continue
        total_mb = row["argument_size_mb"] + max(
            row["output_size_mb"], 0) + row["temp_size_mb"]
        row["total_mb"] = round(total_mb, 1)
        row["fits"] = bool(total_mb < hbm_gb * 1024)
        rows[f"batch={b}"] = row
        print(json.dumps({f"{w}x{h} {net} batch={b}": row}), flush=True)
    return rows


def main(argv=None):
    p = argparse.ArgumentParser("spatial_memory_table")
    p.add_argument("--mode", choices=("spatial", "fit"), default="spatial")
    p.add_argument("--img_shape", default="2048x1024",
                   help="WxH geometry to compile at")
    p.add_argument("--net", default="drn_d_38")
    p.add_argument("--num_k", type=int, default=1)
    p.add_argument("--n_devices", type=int, default=8)
    p.add_argument("--batches", default="8,16,24,32,48,64",
                   help="fit mode: per-chip batches to sweep")
    p.add_argument("--hbm_gb", type=float, default=16.0,
                   help="fit mode: per-chip HBM capacity (v5e: 16)")
    a = p.parse_args(argv)
    w, h = (int(v) for v in a.img_shape.lower().split("x"))
    if a.mode == "spatial":
        run_spatial(w, h, a.n_devices, a.net, a.num_k)
    else:
        run_fit(w, h, a.net, a.num_k,
                [int(x) for x in a.batches.split(",")], a.hbm_gb)


if __name__ == "__main__":
    main()
