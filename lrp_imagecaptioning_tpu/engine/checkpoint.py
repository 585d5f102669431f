"""Checkpoint / resume via Orbax.

Replaces ``modelutils.save_checkpoint`` (modelutils.py:115-144) and the resume
logic (train.py:83-94): we persist {params, opt_state, epoch,
epochs_since_improvement, bleu4, cider} with the same
``checkpoint_{dataset}_epoch{E}_cider_{C}`` naming convention, under
``{save_path}/{encoder}/{dataset}/``.  ``load_for_eval`` restores params only
(test.py:44-50 semantics)."""

from __future__ import annotations

import os
import re
from typing import Any

import numpy as np
import orbax.checkpoint as ocp


def _ckpt_dir(save_path: str, encoder: str, dataset: str) -> str:
    return os.path.abspath(os.path.join(save_path, encoder, dataset))


def save_checkpoint(
    dataset: str,
    epoch: int | str,
    epochs_since_improvement: int,
    state: Any,  # TrainState
    bleu4: float,
    cider: float,
    save_path: str,
    encoder: str,
) -> str:
    d = _ckpt_dir(save_path, encoder, dataset)
    os.makedirs(d, exist_ok=True)
    name = f"checkpoint_{dataset}_epoch{epoch}_cider_{cider:.4f}"
    path = os.path.join(d, name)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(
            path,
            dict(
                params=state.params,
                opt_state=state.opt_state,
                step=state.step,
                meta=dict(
                    epoch=np.asarray(epoch if isinstance(epoch, int) else -1),
                    epochs_since_improvement=np.asarray(epochs_since_improvement),
                    bleu4=np.asarray(bleu4),
                    cider=np.asarray(cider),
                ),
            ),
        )
    return path


def restore_checkpoint(path: str, template_state: Any) -> tuple[Any, dict]:
    """Restore a full TrainState + host metadata for resuming (train.py:83-89)."""
    with ocp.StandardCheckpointer() as ckptr:
        target = dict(
            params=template_state.params,
            opt_state=template_state.opt_state,
            step=template_state.step,
            meta=dict(
                epoch=np.asarray(0),
                epochs_since_improvement=np.asarray(0),
                bleu4=np.asarray(0.0),
                cider=np.asarray(0.0),
            ),
        )
        restored = ckptr.restore(os.path.abspath(path), target)
    state = template_state.replace(
        params=restored["params"],
        opt_state=restored["opt_state"],
        step=restored["step"],
    )
    meta = {k: v.item() for k, v in restored["meta"].items()}
    return state, meta


def load_for_eval(path: str, template_state: Any) -> Any:
    """Params-only restore for evaluation (test.py:44-50): restores the full
    checkpoint against a template TrainState and returns just the params."""
    state, _ = restore_checkpoint(path, template_state)
    return state.params


def find_best_checkpoint(save_path: str, encoder: str, dataset: str) -> str | None:
    """Pick the highest-CIDEr checkpoint by filename (the reference embeds the
    score in the name, modelutils.py:137)."""
    d = _ckpt_dir(save_path, encoder, dataset)
    if not os.path.isdir(d):
        return None
    best, best_c = None, -1.0
    pat = re.compile(r"checkpoint_.+_cider_([0-9.]+)$")
    for name in os.listdir(d):
        m = pat.match(name)
        if m:
            c = float(m.group(1).rstrip("."))
            if c > best_c:
                best, best_c = os.path.join(d, name), c
    return best
