"""Observability: structured run logging and throughput/convergence stats.

Replaces the reference's printf + timer.h walltime prints (SURVEY.md §5.1/5.5)
with structured per-phase records (JSON lines) plus the headline metric —
variable updates/s — computed the same way bench.py reports it.
"""
from __future__ import annotations

import json
import sys
import time
from typing import Any, Dict, Optional

import numpy as np


class RunLog:
    """JSONL event logger; quiet mode drops human echo but keeps the file."""

    def __init__(self, path: Optional[str] = None, quiet: bool = False):
        self.path = path
        self.quiet = quiet
        self._fp = open(path, "a") if path else None
        self._t0 = time.time()

    def event(self, kind: str, **fields: Any) -> None:
        rec = {"t": round(time.time() - self._t0, 4), "kind": kind, **fields}
        if self._fp:
            self._fp.write(json.dumps(rec) + "\n")
            self._fp.flush()
        if not self.quiet:
            msg = " ".join(f"{k}={v}" for k, v in fields.items())
            print(f"[{rec['t']:9.2f}s] {kind}: {msg}", file=sys.stderr,
                  flush=True)

    def close(self) -> None:
        if self._fp:
            self._fp.close()


def throughput(n_vars: int, n_sweeps: int, n_chains: int, seconds: float) -> float:
    """Variable updates/s — the [B] headline metric."""
    return n_vars * n_sweeps * n_chains / max(seconds, 1e-12)


def weight_stats(weights) -> Dict[str, float]:
    w = np.asarray(weights, np.float64)
    return {
        "w_l2": float(np.linalg.norm(w)),
        "w_max": float(np.abs(w).max()) if w.size else 0.0,
        "w_mean": float(w.mean()) if w.size else 0.0,
    }


def marginal_entropy(marginals) -> float:
    """Mean per-variable entropy of the estimated marginals — a cheap
    convergence/mixing indicator."""
    m = np.clip(np.asarray(marginals, np.float64), 1e-12, 1.0)
    ent = -(m * np.log(m)).sum(axis=-1)
    return float(ent.mean())
