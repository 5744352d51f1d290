"""Checkpoint / preemption-resume utilities.

Reference behavior (SURVEY.md §5.3/§5.4): diffusion keeps a rolling
``checkpoints-meta`` snapshot restored on startup (``trainer.py:48-55``) plus
periodic ``checkpoint_{step}``; reconstruction only saves final state.  Here
both trainers get the same orbax-backed save/restore, and reconstruction
gains mid-run resume (a free capability the reference lacks).
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def save(path: str, state: Any):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), state, force=True)
    ckptr.wait_until_finished()


def restore(path: str, template: Any) -> Any:
    """Graceful: returns ``template`` unchanged when no checkpoint exists
    (ref ``GMeshDiffusion/lib/diffusion/utils.py:6-36``)."""
    import orbax.checkpoint as ocp

    if not os.path.exists(path):
        return template
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)


def save_periodic(workdir: str, state: Any, step: int, every: int, keep_meta: bool = True):
    """Rolling meta snapshot + periodic numbered snapshots
    (ref trainer.py:144-163)."""
    if keep_meta:
        save(os.path.join(workdir, "checkpoints-meta"), state)
    if every and step % every == 0:
        save(os.path.join(workdir, f"checkpoint_{step}"), state)
