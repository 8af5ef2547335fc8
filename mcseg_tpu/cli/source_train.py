"""Source-only training entry point (reference: source_trainer.py).

    python -m mcseg_tpu.cli.source_train nyu --input_ch 6 --net drn_d_38 ...
"""

from mcseg_tpu.cli.argparse_compat import args_to_config, get_src_only_training_parser
from mcseg_tpu.train.loops import train_source
from mcseg_tpu.utils.util import mkdir_if_not_exist, save_dic_to_json


def main(argv=None):
    from mcseg_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    args = get_src_only_training_parser().parse_args(argv)
    from mcseg_tpu.parallel.multihost import (
        is_primary,
        maybe_initialize_from_args,
    )

    # must run before the first real jax use (multihost no-ops
    # without the flags)
    maybe_initialize_from_args(args)
    cfg = args_to_config(args, adapt=False)
    mkdir_if_not_exist(cfg.train.out_dir)
    if is_primary():
        save_dic_to_json(cfg.to_dict(), f"{cfg.train.out_dir}/args.json")
    from mcseg_tpu.cli._epoch_eval import make_epoch_eval_hook
    from mcseg_tpu.utils.logging import make_run_logger
    from mcseg_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(spatial=cfg.train.spatial_devices)
    logger = make_run_logger(cfg.train)
    hook = make_epoch_eval_hook(cfg, mesh, args.eval_every_epochs,
                                logger=logger)
    train_source(cfg, mesh=mesh, logger=logger, on_epoch_end=hook)


if __name__ == "__main__":
    main()
