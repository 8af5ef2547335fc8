"""Budget behavior of the driver-facing multichip dryrun (__graft_entry__):
the flagship mcd config always runs; secondary families that cannot fit the
remaining MCSEG_DRYRUN_BUDGET_S print an explicit "skipped (budget ...)"
line and the sweep still completes (exit 0) — the artifact degrades
gracefully instead of dying rc=124 mid-family (VERDICT r4 #1). Pure-Python:
the jax setup and the per-family work are stubbed out."""

import importlib
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_entry():
    sys.path.insert(0, REPO)
    import __graft_entry__ as ge

    return importlib.reload(ge)


def _run(monkeypatch, budget_s, family_cost_s):
    ge = _load_entry()
    calls = []

    monkeypatch.setenv("MCSEG_DRYRUN_BUDGET_S", str(budget_s))
    monkeypatch.delenv("MCSEG_DRYRUN_SPATIAL", raising=False)
    monkeypatch.setattr(ge, "_force_cpu_mesh", lambda n: _FakeJax())

    def fake_family(jax, n, family, spatial=1):
        calls.append((family, spatial))
        time.sleep(family_cost_s)
        return f"{family}: {n}-dev == 1-dev (stub)"

    monkeypatch.setattr(ge, "_dryrun_family", fake_family)
    ge.dryrun_multichip(8)
    return calls


class _FakeJax:
    class config:
        @staticmethod
        def update(*a, **k):
            pass


def test_all_families_run_when_budget_fits(monkeypatch):
    calls = _run(monkeypatch, budget_s=10_000, family_cost_s=0.0)
    assert calls == [("mcd", 1), ("multitask", 1), ("late", 1)]


def test_secondary_families_skip_on_tight_budget(monkeypatch, capsys):
    # flagship cost ~0.2s; the secondary estimate floor is 90s, far over a
    # 1-second budget -> both secondaries must SKIP, sweep must still finish
    calls = _run(monkeypatch, budget_s=1, family_cost_s=0.2)
    assert calls == [("mcd", 1)]  # flagship always runs
    out = capsys.readouterr().out
    # one inline line per skipped family (the summary repeats them joined)
    assert out.count("dryrun_multichip(8) multitask: skipped (budget:") == 1
    assert out.count("dryrun_multichip(8) late: skipped (budget:") == 1
    # the summary counts only VALIDATED configs, with skips called out
    assert "ok — 1 step configs validated (2 skipped on budget)" in out


def test_spatial_config_is_opt_in(monkeypatch):
    monkeypatch.setenv("MCSEG_DRYRUN_SPATIAL", "1")
    ge = _load_entry()
    calls = []
    monkeypatch.setenv("MCSEG_DRYRUN_BUDGET_S", "10000")
    monkeypatch.setattr(ge, "_force_cpu_mesh", lambda n: _FakeJax())
    monkeypatch.setattr(
        ge, "_dryrun_family",
        lambda jax, n, family, spatial=1: calls.append((family, spatial))
        or f"{family}")
    ge.dryrun_multichip(8)
    assert calls == [("mcd", 1), ("multitask", 1), ("late", 1), ("mcd", 4)]
