"""Convert a reference (torch) checkpoint into this framework's format.

The reference saves ``{epoch, args, g_state_dict, f1_state_dict,
f2_state_dict, optimizer_g, optimizer_f}`` via torch.save (SURVEY.md section
5). This tool reads such a file with torch-cpu, maps the G/F1/F2 state dicts
into our flax parameter trees (utils/torch_import.py), and writes a native
checkpoint so testers and --resume work on it (fresh optimizer state).

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


def main(argv=None):
    p = argparse.ArgumentParser("import_torch")
    p.add_argument("torch_checkpoint")
    p.add_argument("out_prefix")
    p.add_argument("--net", default="drn_d_38")
    p.add_argument("--input_ch", type=int, default=3)
    p.add_argument("--n_class", type=int, default=40)
    p.add_argument("--g_key", default="g_state_dict")
    p.add_argument("--f1_key", default="f1_state_dict")
    p.add_argument("--f2_key", default="f2_state_dict")
    args = p.parse_args(argv)

    blob = load_reference_checkpoint(args.torch_checkpoint)
    model_cfg = ModelConfig(net=args.net, input_ch=args.input_ch,
                            n_class=args.n_class)
    cfg = ExperimentConfig(model=model_cfg, data=DataConfig(
        input_ch=args.input_ch, n_class=args.n_class), train=TrainConfig())
    state, _, _ = create_train_state(model_cfg, cfg.train, jax.random.key(0),
                                     img_shape=(16, 16))

    params = dict(state.params)
    stats = dict(state.batch_stats)
    for name, key in (("G", args.g_key), ("F1", args.f1_key), ("F2", args.f2_key)):
        sd = blob.get(key)
        if sd is None:
            print(f"warning: {key!r} not in checkpoint "
                  f"(keys: {sorted(blob)[:10]}); leaving {name} initialized")
            continue
        sd = {k: v for k, v in sd.items() if "up." not in k and "upsample" not in k}
        params[name], stats[name] = import_torch_state_dict(
            sd, params[name], dict(stats[name])
        )
        print(f"imported {name} from {key} ({len(sd)} tensors)")

    step = int(blob.get("epoch", 0))
    state = state.replace(params=params, batch_stats=stats,
                          step=jnp.asarray(step, jnp.int32))
    path = save_checkpoint(args.out_prefix, state, cfg)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
