"""Chain-state checkpoint/resume.

The reference has no checkpointing (runs are minutes-long; SURVEY.md §5.4);
for pod-scale runs preemption recovery matters, so the full sampler state —
assignments, weights, RNG key, tallies, epoch counters — is a small pytree
snapshotted to disk.  Plain .npz is used (orbax is available but overkill
for flat arrays; the format is documented and stable).
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional

import numpy as np


@dataclasses.dataclass
class SamplerState:
    """Everything needed to resume a run deterministically."""

    values: np.ndarray           # [P] or [P, NC] current assignments
    weights: np.ndarray          # [W] float32
    rng_key: np.ndarray          # jax PRNG key data (uint32)
    counts: Optional[np.ndarray] = None   # [P, K] marginal tallies
    sweep: int = 0               # sweeps completed
    epoch: int = 0               # learning epochs completed
    meta: Optional[Dict[str, Any]] = None


def save(state: SamplerState, path: str) -> None:
    tmp = path + ".tmp"
    arrays = dict(
        values=np.asarray(state.values),
        weights=np.asarray(state.weights),
        rng_key=np.asarray(state.rng_key),
        sweep=np.asarray(state.sweep),
        epoch=np.asarray(state.epoch),
    )
    if state.counts is not None:
        arrays["counts"] = np.asarray(state.counts)
    arrays["meta_json"] = np.frombuffer(
        json.dumps(state.meta or {}).encode(), dtype=np.uint8)
    np.savez(tmp, **arrays)
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)


def load(path: str) -> SamplerState:
    z = np.load(path, allow_pickle=False)
    meta = json.loads(bytes(z["meta_json"]).decode()) if "meta_json" in z else {}
    return SamplerState(
        values=z["values"],
        weights=z["weights"],
        rng_key=z["rng_key"],
        counts=z["counts"] if "counts" in z else None,
        sweep=int(z["sweep"]),
        epoch=int(z["epoch"]),
        meta=meta,
    )
