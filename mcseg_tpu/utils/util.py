"""Small host utilities — counterpart of the reference's ``util.py``
(SURVEY.md section 2): run-dir management, arg/config JSON dumps, overwrite
guards. ``adjust_learning_rate`` lives in train/optim.py as a schedule."""

from __future__ import annotations

import json
import os
from typing import Any, Dict


def mkdir_if_not_exist(path: str) -> str:
    os.makedirs(path, exist_ok=True)
    return path


def save_dic_to_json(dic: Dict[str, Any], path: str) -> None:
    """Persist the run's config next to its checkpoints (the reference dumps
    parsed args as JSON into the run dir)."""
    with open(path, "w") as f:
        json.dump(dic, f, indent=2, sort_keys=True, default=str)


def load_json(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return json.load(f)


def emphasize_str(s: str) -> str:
    bar = "=" * max(len(s), 8)
    return f"{bar}\n{s}\n{bar}"


def check_if_done(path: str, overwrite: bool = False) -> None:
    """Non-interactive version of the reference's overwrite guard: raise
    instead of prompting (autonomous runs can pass overwrite=True)."""
    if os.path.exists(path) and not overwrite:
        raise FileExistsError(
            f"{path} already exists; pass --overwrite to replace it"
        )
