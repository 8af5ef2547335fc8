"""Subprocess body for tests/test_multihost.py — one REAL OS process of a
multi-process (multihost) training job.

Invoked as:

    python tests/_multihost_worker.py <process_id> <num_processes> <port> \
        <n_local_devices> <out_dir> [family]

Each process gets ``n_local_devices`` virtual CPU devices; with
``num_processes > 1`` they connect through jax.distributed (Gloo CPU
collectives) exactly like one host of a TPU pod slice connects over DCN.
``num_processes == 1`` is the single-process oracle: no coordinator, same
config, same global device count. Runs a short fp64 training of ``family``
('source' — the plain supervised loop — or 'mcd', the centerpiece MCD
adaptation loop with two optimizers, the scanned step C, and per-forward BN
crossing the process boundary) through the real production loops
(train/loops.py incl. epoch checkpointing) and exits; the parent test
compares the checkpoints."""

import os
import sys

# runnable from anywhere: the repo root (not tests/) must be importable
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    proc_id, num_procs = int(sys.argv[1]), int(sys.argv[2])
    port, n_local, out_dir = sys.argv[3], int(sys.argv[4]), sys.argv[5]
    family = sys.argv[6] if len(sys.argv) > 6 else "source"

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_local}"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_default_matmul_precision", "highest")

    if num_procs > 1:
        from mcseg_tpu.parallel.multihost import initialize

        initialize(coordinator=f"127.0.0.1:{port}",
                   num_processes=num_procs, process_id=proc_id)
        assert jax.process_count() == num_procs
    assert jax.device_count() == n_local * num_procs, (
        jax.device_count(), n_local, num_procs)

    from mcseg_tpu.core.config import (
        DataConfig,
        ExperimentConfig,
        ModelConfig,
        TrainConfig,
    )
    from mcseg_tpu.train.loops import train_adapt, train_source
    from mcseg_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    cfg = ExperimentConfig(
        model=ModelConfig(net="drn_d_22", input_ch=3, n_class=40,
                          dtype="float64"),
        data=DataConfig(src_dataset="synthetic",
                        tgt_dataset="synthetic_shifted" if family == "mcd"
                        else "synthetic",
                        batch_size=8, train_img_shape=(32, 32),
                        test_img_shape=(32, 32), input_ch=3, max_samples=16,
                        # 'source' drives the streaming host pipeline with the
                        # multihost local-rows decode (pipeline.py
                        # local_rows); 'mcd' keeps the HBM-resident corpus
                        # path — the two bit-equality tests together cover
                        # BOTH production input paths across the process
                        # boundary
                        device_corpus="off" if family == "source" else "auto"),
        train=TrainConfig(out_dir=out_dir, lr=0.05, lr_schedule="constant",
                          epochs=2, log_every=1, max_steps=100,
                          num_k=2),
    )
    if family == "mcd":
        train_adapt(cfg, max_iterations=3)
    else:
        train_source(cfg, max_iterations=3)
    print(f"worker {proc_id}/{num_procs} {family} done", flush=True)


if __name__ == "__main__":
    main()
