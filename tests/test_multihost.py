"""Multi-host (multi-process) data parallelism — parallel/multihost.py.

The crown test spawns TWO real OS processes (4 virtual CPU devices each,
Gloo-connected through jax.distributed — the same client/collective stack a
TPU pod slice uses over DCN) and runs the production ``train_source`` loop in
both, then compares the checkpoint against a single-process run of the same
global config: the multihost machinery (callback-based placement in
shard_batch/replicate, process-0 checkpoint/log gating, the final-checkpoint
barrier) must be invisible to the math.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

from mcseg_tpu.parallel import multihost

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_multihost_worker.py")


def test_single_process_helpers_are_noops():
    assert multihost.is_primary()
    multihost.sync("test")  # must not require a coordinator
    # no multihost flags -> no initialize() attempt (which would fail here)
    class A:
        pass

    multihost.maybe_initialize_from_args(A())


def test_multihost_flags_exist_on_train_parsers():
    from mcseg_tpu.cli.argparse_compat import (
        get_da_mcd_training_parser,
        get_src_only_training_parser,
    )

    for mk, args in ((get_da_mcd_training_parser, ["s", "t"]),
                     (get_src_only_training_parser, ["s"])):
        a = mk().parse_args(args + ["--coordinator", "h:1", "--num_processes",
                                    "2", "--process_id", "1"])
        assert (a.coordinator, a.num_processes, a.process_id) == ("h:1", 2, 1)
        assert mk().parse_args(args).coordinator is None


def test_host_put_single_process_matches_device_put():
    from mcseg_tpu.parallel.mesh import batch_sharding, make_mesh, shard_batch

    mesh = make_mesh(4)
    x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    arr = shard_batch(mesh, {"x": x})["x"]
    assert arr.sharding == batch_sharding(mesh)
    np.testing.assert_array_equal(np.asarray(arr), x)


def test_local_batch_rows_single_process_is_none():
    from mcseg_tpu.parallel.mesh import local_batch_rows, make_mesh

    assert local_batch_rows(make_mesh(4), 8) is None


def test_batch_iterator_local_rows_decodes_only_local_rows():
    """The multihost local-rows decode (VERDICT r4 weak #5): the sampler
    draws the identical global index stream, only the requested rows are
    decoded (O(local batch) host work), and those rows are bit-identical to
    the full decode — the rest are zero-filled and never read by the
    placement layer."""
    from mcseg_tpu.data.pipeline import batch_iterator

    class CountingDS:
        def __init__(self):
            self.calls = 0

        def __len__(self):
            return 32

        def __getitem__(self, i):
            self.calls += 1
            return {"x": np.full((2, 3), i, np.int32)}

    full_ds, loc_ds = CountingDS(), CountingDS()
    full = list(batch_iterator(full_ds, 8, seed=3, epochs=1))
    rows = np.array([2, 3, 6, 7])
    loc = list(batch_iterator(loc_ds, 8, seed=3, epochs=1, local_rows=rows))
    assert len(full) == len(loc) == 4
    assert full_ds.calls == 32
    assert loc_ds.calls == 16  # exactly the local rows
    other = [0, 1, 4, 5]
    for f, l in zip(full, loc):
        np.testing.assert_array_equal(f["x"][rows], l["x"][rows])
        assert np.all(l["x"][other] == 0)

    # local_rows covering the whole batch degrades to the plain path
    all_ds = CountingDS()
    allr = list(batch_iterator(all_ds, 8, seed=3, epochs=1,
                               local_rows=np.arange(8)))
    for f, a in zip(full, allr):
        np.testing.assert_array_equal(f["x"], a["x"])


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_workers(tmp_path, num_procs: int, n_local: int, out_dir: str,
                 family: str = "source"):
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # fresh XLA_FLAGS per worker (the worker appends its own device count)
    env.pop("XLA_FLAGS", None)
    # isolated per-test compile cache: the uid-keyed default dir is shared
    # with every other CPU run on this host, and loading an entry written
    # under different XLA target-feature detection emits "machine feature
    # mismatch ... could lead to SIGILL" and has produced one worker
    # crashing / its Gloo peer timing out; worker processes of ONE test run
    # still share this dir (same env -> compatible entries)
    env["JAX_COMPILATION_CACHE_DIR"] = str(tmp_path / "xla_cache")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), str(num_procs), str(port),
             str(n_local), out_dir, family],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(num_procs)
    ]
    outs = [p.communicate(timeout=1500)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
    return outs


@pytest.mark.slow
def test_two_process_train_matches_single_process(tmp_path):
    """2 processes x 4 devices == 1 process x 8 devices, bit-for-bit (fp64):
    same sampler RNG on every process, callback placement contributes each
    process's rows, Gloo carries the gradient psum across the process
    boundary — and the trained checkpoint must not know the difference."""
    multi_dir = str(tmp_path / "multi")
    single_dir = str(tmp_path / "single")

    _run_workers(tmp_path, num_procs=2, n_local=4, out_dir=multi_dir)
    _run_workers(tmp_path, num_procs=1, n_local=8, out_dir=single_dir)

    from mcseg_tpu.utils.checkpoint import load_checkpoint

    st_m, cfg_m = load_checkpoint(os.path.join(multi_dir, "last"))
    st_s, cfg_s = load_checkpoint(os.path.join(single_dir, "last"))
    assert cfg_m.to_dict()["model"] == cfg_s.to_dict()["model"]
    assert int(st_m.step) == int(st_s.step) == 3

    leaves_m = jax.tree.leaves(st_m.params)
    leaves_s = jax.tree.leaves(st_s.params)
    assert len(leaves_m) == len(leaves_s)
    worst = 0.0
    for a, b in zip(leaves_m, leaves_s):
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape
        worst = max(worst, float(np.max(np.abs(a - b))))
    assert worst <= 1e-9, f"multihost drift: max param diff {worst:.3e}"

    # per-step losses logged by process 0 match the single run's
    def losses(d):
        with open(os.path.join(d, "train_log.jsonl")) as f:
            return [json.loads(line)["loss"] for line in f
                    if "loss" in json.loads(line)]

    lm, ls = losses(multi_dir), losses(single_dir)
    assert len(lm) == len(ls) == 3
    np.testing.assert_allclose(lm, ls, rtol=1e-9)

    # exactly ONE process wrote the run directory (no duplicate/torn files)
    logs = [f for f in os.listdir(multi_dir) if f == "train_log.jsonl"]
    assert len(logs) == 1


def _tree_max_diff(a, b) -> float:
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    worst = 0.0
    for x, y in zip(la, lb):
        x, y = np.asarray(x), np.asarray(y)
        assert x.shape == y.shape
        worst = max(worst, float(np.max(np.abs(x - y))))
    return worst


@pytest.mark.slow
def test_two_process_mcd_matches_single_process(tmp_path):
    """The centerpiece MCD step across the process boundary (VERDICT r4 #3):
    2 processes x 4 devices == 1 process x 8 devices for ``train_adapt`` —
    two optimizers, the scanned step C, per-forward BN statistics, and the
    zipped (source, shifted-target) stream must all be bit-equal (fp64) in
    the adapted checkpoint: params, BOTH optimizer states, and BN stats."""
    multi_dir = str(tmp_path / "multi")
    single_dir = str(tmp_path / "single")

    _run_workers(tmp_path, num_procs=2, n_local=4, out_dir=multi_dir,
                 family="mcd")
    _run_workers(tmp_path, num_procs=1, n_local=8, out_dir=single_dir,
                 family="mcd")

    from mcseg_tpu.utils.checkpoint import load_checkpoint

    st_m, cfg_m = load_checkpoint(os.path.join(multi_dir, "last"))
    st_s, cfg_s = load_checkpoint(os.path.join(single_dir, "last"))
    assert cfg_m.to_dict()["model"] == cfg_s.to_dict()["model"]
    assert int(st_m.step) == int(st_s.step) == 3
    assert set(st_m.params) >= {"G", "F1", "F2"}

    for name, tree_m, tree_s in (
        ("params", st_m.params, st_s.params),
        ("batch_stats", st_m.batch_stats, st_s.batch_stats),
        ("opt_g", st_m.opt_g, st_s.opt_g),
        ("opt_f", st_m.opt_f, st_s.opt_f),
    ):
        worst = _tree_max_diff(tree_m, tree_s)
        assert worst <= 1e-9, f"multihost MCD drift in {name}: {worst:.3e}"

    # the MCD losses process 0 logged match the single-process run's
    def metrics(d):
        with open(os.path.join(d, "train_log.jsonl")) as f:
            recs = [json.loads(line) for line in f]
        return [(r["loss_source"], r["loss_b"], r["loss_dis"])
                for r in recs if "loss_dis" in r]

    mm, ms = metrics(multi_dir), metrics(single_dir)
    assert len(mm) == len(ms) == 3
    np.testing.assert_allclose(mm, ms, rtol=1e-9)
