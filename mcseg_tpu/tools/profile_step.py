"""Profile the fused MCD train step and print a per-op cost summary.

The observability tool behind this framework's perf work (SURVEY.md section 5
tracing/profiling): captures a jax.profiler trace of N steps on the real
device, parses the xplane proto directly (no TensorBoard UI needed), and
prints XLA-op time grouped by category + the top individual ops.

    python -m mcseg_tpu.tools.profile_step --batch 24 --steps 3

Needs PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python for the proto parse (set
automatically).
"""

from __future__ import annotations

import argparse
import collections
import functools
import glob
import os
import re
import shutil

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

from mcseg_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()


def summarize_xplane(trace_dir: str, steps: int, top: int = 25) -> str:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: PLC0415

    xp = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    if not xp:
        return "no xplane capture found"
    space = xplane_pb2.XSpace()
    with open(xp[0], "rb") as f:
        space.ParseFromString(f.read())
    out = []
    for plane in space.planes:
        if "TPU" not in plane.name and "CPU" in plane.name:
            continue
        ev_meta = {k: v.name for k, v in plane.event_metadata.items()}
        tot: collections.Counter = collections.Counter()
        cnt: collections.Counter = collections.Counter()
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                tot[name] += ev.duration_ps / 1e9
                cnt[name] += 1
        if not tot:
            continue
        total = sum(tot.values())
        out.append(f"plane {plane.name}: {total / steps:.0f} ms/step XLA-op time")
        cats: collections.Counter = collections.Counter()
        for name, t in tot.items():
            m = re.match(r"%([a-zA-Z\-_\.]+?)[\.\s=]", name)
            cats[m.group(1) if m else name[:25]] += t
        for c, t in cats.most_common(12):
            out.append(f"  CAT {t / steps:9.1f} ms/step  {c}")
        out.append("  --- top ops ---")
        for name, t in tot.most_common(top):
            out.append(f"  {t / steps:8.1f} ms/step x{cnt[name] // steps:<4d} {name[:120]}")
    return "\n".join(out)


def main(argv=None):
    p = argparse.ArgumentParser("profile_step")
    p.add_argument("--batch", type=int, default=24)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--net", default="drn_d_38")
    p.add_argument("--input_ch", type=int, default=6)
    p.add_argument("--num_k", type=int, default=4)
    p.add_argument("--img", type=int, nargs=2, default=[640, 480], metavar=("W", "H"))
    p.add_argument("--trace_dir", default="/tmp/mcseg_profile")
    p.add_argument("--top", type=int, default=25,
                   help="rows in the top-ops table")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mcseg_tpu.core.config import DataConfig, ModelConfig, TrainConfig
    from mcseg_tpu.data.labels import get_label_spec
    from mcseg_tpu.models.factory import get_models
    from mcseg_tpu.ops.preprocess import make_train_preprocess
    from mcseg_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from mcseg_tpu.train.mcd import make_mcd_step
    from mcseg_tpu.train.state import create_train_state

    mesh = make_mesh()
    b = args.batch
    w, h = args.img
    model_cfg = ModelConfig(net=args.net, input_ch=args.input_ch, n_class=40,
                            dtype="bfloat16")
    data_cfg = DataConfig(src_dataset="suncg", tgt_dataset="nyu", batch_size=b,
                          train_img_shape=(w, h), input_ch=args.input_ch)
    train_cfg = TrainConfig(lr=1e-3, num_k=args.num_k, max_steps=100_000)
    state, tx_g, tx_f = create_train_state(model_cfg, train_cfg,
                                           jax.random.key(0), img_shape=(64, 64))
    state = replicate(mesh, state)
    g, f1, f2 = get_models(model_cfg)
    pp = make_train_preprocess(data_cfg)
    tgt_remap = get_label_spec("nyu")[1]
    inner = make_mcd_step(g, f1, f2, tx_g, tx_f, train_cfg)
    data_key = jax.random.key(1)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def full_step(state, src_raw, tgt_raw):
        key = jax.random.fold_in(data_key, state.step)
        k_src, k_tgt = jax.random.split(key)
        xs, ys = pp(src_raw, k_src)
        xt, _ = pp(tgt_raw, k_tgt, remap_table=tgt_remap)
        return inner(state, xs, ys, xt)

    def raw(seed):
        r = np.random.RandomState(seed)
        return shard_batch(mesh, {
            "image": r.randint(0, 255, (b, h, w, 3)).astype(np.uint8),
            "label": r.randint(0, 41, (b, h, w)).astype(np.uint8),
            "depth": (r.rand(b, h, w).astype(np.float32) * 3 + 0.5),
        })

    src, tgt = raw(0), raw(1)
    state, m = full_step(state, src, tgt)
    print("warmed up; loss_source =", float(m["loss_source"]))

    shutil.rmtree(args.trace_dir, ignore_errors=True)
    jax.profiler.start_trace(args.trace_dir)
    for _ in range(args.steps):
        state, m = full_step(state, src, tgt)
    print("traced; loss_source =", float(m["loss_source"]))  # forces sync
    jax.profiler.stop_trace()

    print(summarize_xplane(args.trace_dir, args.steps, top=args.top))


if __name__ == "__main__":
    main()
