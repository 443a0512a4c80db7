"""Checkpoint / resume via orbax.

Reference parity: ``torch.save(model.state_dict())`` → ``il_model.pth`` /
periodic ``rl_model.pth`` and ``train.py --resume`` (SURVEY.md §5). Here a
single orbax pytree checkpoint captures params + target params + optimizer
state + loop counters (strictly more than the reference, which dropped
optimizer state and replay memory).
"""

from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp


def save(path: str, state: Any) -> None:
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)


def restore(path: str, template: Any) -> Any:
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, template)


def exists(path: str) -> bool:
    return os.path.isdir(os.path.abspath(path))
