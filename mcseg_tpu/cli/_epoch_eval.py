"""Shared --eval_every_epochs hook for the training entry points.

The reference evaluates with separate tester scripts; this optional hook runs
the same evaluator (mesh-sharded fast-hist, all local devices) on the target
val split at epoch boundaries and logs mIoU into the run's JSONL stream —
epoch-end eval without stalling an n-chip run on one device.
"""

from __future__ import annotations

from typing import Optional


def make_epoch_eval_hook(cfg, mesh, every: int, logger=None) -> Optional[callable]:
    if not every or every <= 0:
        return None

    from mcseg_tpu.data.datasets import get_dataset
    from mcseg_tpu.eval.tester import evaluate, make_eval_step

    try:
        dataset = get_dataset(cfg.data.tgt_dataset, cfg.data, "val")
    except FileNotFoundError:
        print("eval_every_epochs: no 'val' split found for "
              f"{cfg.data.tgt_dataset!r}; epoch-end eval disabled")
        return None

    cache = {}  # one jitted eval step for the whole run, not one per epoch

    def hook(epoch: int, state):
        if epoch % every:
            return
        if "step" not in cache:
            with_depth = "D" in state.params and "depth" in dataset[0]
            cache["step"] = make_eval_step(cfg, True, with_depth=with_depth,
                                           with_boundary="B" in state.params)
        miou, _, _ = evaluate(state, cfg, dataset, print_table=False,
                              mesh=mesh, eval_step=cache["step"])
        import jax

        # carry the global step so the TensorBoard scalar lands on the
        # training x-axis instead of piling up at step 0
        line = {"step": int(jax.device_get(state.step)), "epoch": epoch,
                "val_miou": round(100.0 * float(miou), 3)}
        if logger is not None:
            logger.log(line)
        else:
            print(f"epoch={epoch}  val_mIoU={line['val_miou']}", flush=True)

    return hook
