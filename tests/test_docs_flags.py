"""Docs-drift guard: every `--flag` mentioned in README.md / docs/*.md must
exist in a real argument parser (round-1 ADVICE caught a phantom `--res`
flag advertised in a docstring; this pins the whole documented CLI surface
against the code)."""

import os
import re

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# flags that legitimately appear in docs but belong to other programs
_EXTERNAL = {
    "--xla_force_host_platform_device_count",  # XLA env flag
    "--xla_backend_optimization_level",  # XLA flag (discussed in perf notes)
}


def _real_flags():
    flags = set()
    # source scan: catches every add_argument in cli/ and tools/ without
    # importing heavyweight tool modules
    for dirpath, _, files in os.walk(os.path.join(ROOT, "mcseg_tpu")):
        for f in files:
            if f.endswith(".py"):
                with open(os.path.join(dirpath, f)) as fh:
                    flags |= set(re.findall(
                        r'add_argument\(\s*\n?\s*"(--[a-z0-9_]+)"', fh.read()))
    # the canonical CLI parser factories, via argparse itself
    from mcseg_tpu.cli.argparse_compat import (
        get_da_mcd_training_parser,
        get_src_only_training_parser,
        get_testing_parser,
    )

    for factory in (get_da_mcd_training_parser, get_src_only_training_parser,
                    get_testing_parser):
        for action in factory()._actions:
            flags |= set(action.option_strings)
    return flags


def _doc_flags():
    docs = [os.path.join(ROOT, "README.md")]
    ddir = os.path.join(ROOT, "docs")
    docs += [os.path.join(ddir, f) for f in os.listdir(ddir)
             if f.endswith(".md")]
    mentioned = {}
    for d in docs:
        with open(d) as fh:
            for flag in re.findall(r"(--[a-z0-9_]+)\b", fh.read()):
                mentioned.setdefault(flag, []).append(os.path.basename(d))
    return mentioned


def test_docs_mention_only_real_flags():
    real = _real_flags()
    assert "--net" in real and "--num_k" in real  # sanity: extraction works
    unknown = {f: srcs for f, srcs in _doc_flags().items()
               if f not in real and f not in _EXTERNAL}
    assert not unknown, (
        f"docs mention flags no parser defines: {unknown} — fix the doc or "
        "add the flag")
