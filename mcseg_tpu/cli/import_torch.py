"""Convert a reference (torch) checkpoint into this framework's format.

Two torch input layouts are accepted (SURVEY.md section 5):

1. Reference training checkpoint: ``{epoch, args, g_state_dict,
   f1_state_dict, f2_state_dict, optimizer_g, optimizer_f}``. All three
   module trees are imported.
2. Bare trunk state_dict (torchvision / fyu-drn ImageNet weights — a flat
   ``{name: tensor}`` dict, auto-detected or forced with ``--g_only``). Only
   the G trunk is seeded; classifiers stay freshly initialized. This is the
   reference's pretrained-seeding path: its vendored drn.py downloads ImageNet
   weights and model_util copies them into the (possibly widened) first conv.

First-conv widening is automatic: with ``--input_ch 6`` (RGB+HHA) the RGB
slice of the pretrained 3-channel kernel is kept and the extra channels are
filled with the RGB channel-mean (models/factory.widen_first_conv_params),
mirroring the reference's model_util behavior.

The torch ``epoch`` field is NOT written into ``state.step``: step is the
per-iteration counter driving the poly LR schedule, while the reference's
epoch is run metadata. Imported checkpoints start at step 0 (fresh schedule);
the source epoch is reported on stdout.

    python -m mcseg_tpu.cli.import_torch ref_ckpt.pth.tar out_prefix \
        --net drn_d_38 --input_ch 6 --n_class 40
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from mcseg_tpu.core.config import DataConfig, ExperimentConfig, ModelConfig, TrainConfig
from mcseg_tpu.train.state import create_train_state
from mcseg_tpu.utils.checkpoint import save_checkpoint
from mcseg_tpu.utils.torch_import import import_torch_state_dict, load_reference_checkpoint


def _is_bare_state_dict(blob) -> bool:
    """A flat {name: tensor} dict (ImageNet trunk weights) rather than the
    reference's {epoch, args, *_state_dict, optimizer_*} checkpoint."""
    if not isinstance(blob, dict) or not blob:
        return False
    if any(k.endswith("state_dict") for k in blob):
        return False
    return all(hasattr(v, "shape") for v in blob.values())


def main(argv=None):
    from mcseg_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    p = argparse.ArgumentParser("import_torch")
    p.add_argument("torch_checkpoint")
    p.add_argument("out_prefix")
    p.add_argument("--net", default="drn_d_38")
    p.add_argument("--input_ch", type=int, default=3)
    p.add_argument("--n_class", type=int, default=40)
    p.add_argument("--g_key", default="g_state_dict")
    p.add_argument("--f1_key", default="f1_state_dict")
    p.add_argument("--f2_key", default="f2_state_dict")
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"],
                   help="compute dtype embedded in the imported config "
                        "(float32 for bit-exact CPU parity evals)")
    p.add_argument("--upsample", default="convt", choices=["convt", "resize"])
    p.add_argument("--g_only", action="store_true",
                   help="treat the file as a bare trunk state_dict "
                        "(ImageNet weights); auto-detected when no "
                        "*_state_dict keys are present")
    args = p.parse_args(argv)

    blob = load_reference_checkpoint(args.torch_checkpoint)
    model_cfg = ModelConfig(net=args.net, input_ch=args.input_ch,
                            n_class=args.n_class, dtype=args.dtype,
                            upsample=args.upsample)
    cfg = ExperimentConfig(model=model_cfg, data=DataConfig(
        input_ch=args.input_ch, n_class=args.n_class), train=TrainConfig())
    state, _, _ = create_train_state(model_cfg, cfg.train, jax.random.key(0),
                                     img_shape=(16, 16))

    params = dict(state.params)
    stats = dict(state.batch_stats)

    if args.g_only or _is_bare_state_dict(blob):
        # Bare ImageNet/fyu-drn trunk: seed G only. The trunk's trailing
        # classification head (fc/logits tensors) is simply never matched.
        sd = {k: v for k, v in blob.items() if not k.startswith("fc")}
        params["G"], stats["G"] = import_torch_state_dict(
            sd, params["G"], dict(stats["G"])
        )
        print(f"seeded G trunk from bare state_dict ({len(sd)} tensors); "
              f"F1/F2 freshly initialized")
        epoch = None
    else:
        for name, key in (("G", args.g_key), ("F1", args.f1_key),
                          ("F2", args.f2_key)):
            sd = blob.get(key)
            if sd is None:
                print(f"warning: {key!r} not in checkpoint "
                      f"(keys: {sorted(blob)[:10]}); leaving {name} initialized")
                continue
            sd = {k: v for k, v in sd.items()
                  if "up." not in k and "upsample" not in k}
            params[name], stats[name] = import_torch_state_dict(
                sd, params[name], dict(stats[name])
            )
            print(f"imported {name} from {key} ({len(sd)} tensors)")
        epoch = blob.get("epoch")

    state = state.replace(params=params, batch_stats=stats,
                          step=jnp.zeros((), jnp.int32))
    path = save_checkpoint(args.out_prefix, state, cfg)
    if epoch is not None:
        print(f"note: source checkpoint was at epoch {epoch}; step reset to 0 "
              f"(the LR schedule restarts — step counts iterations, not epochs)")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
