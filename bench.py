"""Headline benchmark: MCD UDA train-iteration throughput, images/sec/chip.

Config = BASELINE.json's throughput metric: RGB+HHA (6-channel early fusion)
MCD adaptation at 640x480 with DRN-D-38, num_k=4 — i.e. each iteration does
2+2+2*num_k = 12 generator passes (fwd and/or bwd) like the reference's
adapt_trainer loop — INCLUDING the fused on-device preprocessing (label remap,
depth->HHA encode, joint crop/flip/resize, normalize, stack).

images/sec/chip counts (source + target) images consumed per iteration,
divided by the number of chips used.

vs_baseline: the reference never published throughput and the reference mount
is empty (SURVEY.md section 6), so the denominator is a documented PROXY:
5.0 images/sec/chip — a generous estimate of the reference's PyTorch-0.4-era
single-GPU adapt_trainer rate at 640x480 (MCD paper-era hardware; tqdm rates
reported around 1-3 it/s at batch 1-2 with num_k=4 [R?]). Replace with a
measured number when the reference becomes runnable.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import functools

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mcseg_jax_cache")

REFERENCE_PROXY_IMG_PER_SEC_PER_CHIP = 5.0


def main():
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

    on_tpu = jax.devices()[0].platform == "tpu"
    n_chips = len(jax.devices())
    mesh = make_mesh()

    # Throughput config (BASELINE config 4/5): RGB+HHA early-fusion MCD.
    w, h = (640, 480) if on_tpu else (64, 64)
    # batch 24/chip measured fastest on v5e (30.0 img/s/chip vs 28.0 at 8)
    per_chip_batch = int(os.environ.get("BENCH_PER_CHIP_BATCH", "24" if on_tpu else "1"))
    b = per_chip_batch * n_chips
    num_k = 4
    steps = 20 if on_tpu else 2

    model_cfg = ModelConfig(net="drn_d_38", input_ch=6, n_class=40, dtype="bfloat16")
    data_cfg = DataConfig(
        src_dataset="suncg", tgt_dataset="nyu", batch_size=b,
        train_img_shape=(w, h), input_ch=6,
    )
    train_cfg = TrainConfig(lr=1e-3, num_k=num_k, max_steps=100_000)

    state, tx_g, tx_f = create_train_state(
        model_cfg, train_cfg, jax.random.key(0), img_shape=(64, 64)
    )
    state = replicate(mesh, state)
    g, f1, f2 = get_models(model_cfg)
    pp = make_train_preprocess(data_cfg)
    _, tgt_remap, _, _ = get_label_spec("nyu")
    tgt_remap = jnp.asarray(tgt_remap)
    inner = make_mcd_step(g, f1, f2, tx_g, tx_f, train_cfg)
    data_key = jax.random.key(1)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def full_step(state, src_raw, tgt_raw):
        key = jax.random.fold_in(data_key, state.step)
        k_src, k_tgt = jax.random.split(key)
        xs, ys = pp(src_raw, k_src)
        xt, _ = pp(tgt_raw, k_tgt, remap_table=tgt_remap)
        return inner(state, xs, ys, xt)

    # raw decode-resolution batches (the host would deliver these)
    r = np.random.RandomState(0)
    h0, w0 = (480, 640) if on_tpu else (64, 64)

    def raw(seed):
        rr = np.random.RandomState(seed)
        return shard_batch(mesh, {
            "image": rr.randint(0, 255, (b, h0, w0, 3)).astype(np.uint8),
            "label": rr.randint(0, 41, (b, h0, w0)).astype(np.uint8),
            "depth": (rr.rand(b, h0, w0).astype(np.float32) * 3 + 0.5),
        })

    src, tgt = raw(0), raw(1)

    # warmup / compile
    state, metrics = full_step(state, src, tgt)
    jax.block_until_ready(state.params)

    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = full_step(state, src, tgt)
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0

    # 2 images consumed per iteration element (one source + one target)
    imgs_per_sec = 2.0 * b * steps / dt
    per_chip = imgs_per_sec / n_chips
    print(json.dumps({
        "metric": "mcd_train_images_per_sec_per_chip_640x480_rgbhha",
        "value": round(per_chip, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(per_chip / REFERENCE_PROXY_IMG_PER_SEC_PER_CHIP, 3),
    }))


if __name__ == "__main__":
    main()
