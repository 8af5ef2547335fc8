"""Console-script shims.

The setuptools entry-point wrapper runs ``sys.exit(target())``, and several
CLI mains deliberately return useful values for programmatic callers —
adapt_test returns the mIoU float, export_serving the manifest, summarize_run
the report string. ``sys.exit`` of any non-None/non-int object prints it to
stderr and exits with status 1, so pointing the scripts straight at those
mains would make every successful run look like a failure to the shell.
Each shim swallows the return value and exits 0 (argparse errors and real
exceptions still propagate with their own statuses).
"""

from __future__ import annotations


def source_train():
    from mcseg_tpu.cli import source_train as m

    m.main()
    return 0


def adapt_train():
    from mcseg_tpu.cli import adapt_train as m

    m.main()
    return 0


def multitask_train():
    from mcseg_tpu.cli import multitask_train as m

    m.main()
    return 0


def source_test():
    from mcseg_tpu.cli import source_test as m

    m.main()
    return 0


def adapt_test():
    from mcseg_tpu.cli import adapt_test as m

    m.main()
    return 0


def evaluate_preds():
    from mcseg_tpu.cli import evaluate_preds as m

    m.main()
    return 0


def import_torch():
    from mcseg_tpu.cli import import_torch as m

    m.main()
    return 0


def export_serving():
    from mcseg_tpu.tools import export_serving as m

    m.main()
    return 0


def serve_http():
    from mcseg_tpu.tools import serve_http as m

    m.main()
    return 0


def summarize_run():
    from mcseg_tpu.tools import summarize_run as m

    m.main()
    return 0


def bench_serving():
    from mcseg_tpu.tools import bench_serving as m

    m.main()
    return 0
