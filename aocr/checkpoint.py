"""Checkpoint save/load with atomic publish and resume.

Parity with the reference checkpointing
(`/root/reference/src/model/model.lua:720-725`, `src/train.lua:116-128`):
the checkpoint carries {params, batch_stats, config, global_step, optim
state (incl. learning rate)}; every `steps_per_checkpoint` a step-named
checkpoint `model-<step>` is written and atomically published as
`final-model` via a tmp-file + rename (the reference's cp + mv,
train.lua:127-128).  On resume, the learning rate is restored from optimizer
state and clamped to learning_rate_min (train.lua:87-89), and
max_encoder_l / max_decoder_l / batch_size may be overridden by the CLI
(model.lua:75-77).

Format: a single pickle of numpy pytrees (framework-neutral, no torch
serialization) — versioned for forward compatibility.
"""

from __future__ import annotations

import os
import pickle
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np

FORMAT_VERSION = 1
FINAL_NAME = "final-model"


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save(
    model_dir: str,
    params: dict,
    batch_stats: dict,
    config_dict: Dict[str, Any],
    global_step: int,
    optim_state: Dict[str, Any],
    publish_final: bool = True,
) -> str:
    os.makedirs(model_dir, exist_ok=True)
    payload = {
        "version": FORMAT_VERSION,
        "params": _to_numpy(params),
        "batch_stats": _to_numpy(batch_stats),
        "config": config_dict,
        "global_step": int(global_step),
        "optim_state": _to_numpy(optim_state),
    }
    path = os.path.join(model_dir, f"model-{global_step}")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)
    if publish_final:
        final_tmp = os.path.join(model_dir, f".{FINAL_NAME}.tmp")
        shutil.copyfile(path, final_tmp)  # bounded-buffer copy
        os.replace(final_tmp, os.path.join(model_dir, FINAL_NAME))
    return path


def load(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        payload = pickle.load(f)
    assert payload.get("version") == FORMAT_VERSION, (
        f"unsupported checkpoint version {payload.get('version')}"
    )
    return payload


def final_path(model_dir: str) -> str:
    return os.path.join(model_dir, FINAL_NAME)


def try_load_final(model_dir: str) -> Optional[Dict[str, Any]]:
    p = final_path(model_dir)
    return load(p) if os.path.exists(p) else None
