#!/usr/bin/env python
"""Generate (or check) the README benchmark table from committed artifacts.

VERDICT r2 weak #8 / r3 weak #3: README perf claims drifted from the
measured artifacts twice.  The table between the BENCH:BEGIN/END markers
is now machine-generated from the newest committed bench JSON (BENCH_SELF
.json written by `python bench.py | tee`, or the driver's BENCH_r*.json)
plus SCALE_*.json; `--check` mode fails when the README text differs from
what the artifacts produce (tests/test_readme_provenance.py runs it).

Usage:  python tools/readme_bench.py [--check]
"""
import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BEGIN, END = "<!-- BENCH:BEGIN -->", "<!-- BENCH:END -->"


def newest_bench():
    """Latest bench JSON by FILE MTIME across BENCH_SELF.json and the
    driver's BENCH_r*.json (a lexicographic sort would rank r10 before r2,
    and an unconditional BENCH_SELF preference could pin a stale builder
    run over a newer driver round — r4 advisor finding)."""
    cands = glob.glob(os.path.join(ROOT, "BENCH_r*.json"))
    self_path = os.path.join(ROOT, "BENCH_SELF.json")
    if os.path.exists(self_path):
        cands.append(self_path)
    if not cands:
        raise SystemExit("no bench artifact found")
    latest = max(cands, key=os.path.getmtime)
    with open(latest) as f:
        data = json.load(f)
    return data.get("parsed", data), os.path.basename(latest)


def fmt(x):
    if not isinstance(x, float):
        return str(x)
    # normalize every exponent (e+08 -> e8, e+10 -> e10, ...), not just a
    # hard-coded pair (r4 advisor: 1.25e+10 leaked through unnormalized)
    return re.sub(r"e\+?0*(\d)", r"e\1", f"{x:.2e}")


def render():
    d, src = newest_bench()
    rows = [
        ("inference variable updates/s (1024x1024 Ising, 512 chains)",
         d.get("value"), d.get("modes")),
        ("weight-learning updates/s (256 chains, both worlds)",
         d.get("learning_updates_per_s"), None),
        ("categorical (Potts card=4, 512x512, K-candidate path)",
         d.get("categorical_updates_per_s"), d.get("categorical_modes")),
        ("arity-3 boolean (512x512)",
         d.get("arity3_updates_per_s"), d.get("arity3_modes")),
        ("KBC power-law (5e5 vars, skew+window+hub tier, 1024 chains)",
         d.get("kbc_updates_per_s"), d.get("kbc_modes")),
        ("categorical weight-learning updates/s (both worlds)",
         d.get("categorical_learning_updates_per_s"), None),
        ("KBC weight-learning updates/s (2e5 vars, both worlds)",
         d.get("kbc_learning_updates_per_s"), None),
    ]
    out = [f"Source artifact: `{src}` (all numbers measured on one TPU "
           "v5 lite chip by `python bench.py`; absolute rates vary "
           "day-to-day with the shared axon backend - compare within one "
           "artifact, not across rounds).", "",
           "| metric | updates/s | vs 1e9/host | modes |", "|---|---|---|---|"]
    for name, val, modes in rows:
        if val is None:
            continue
        m = "/".join(modes) if modes else "-"
        out.append(f"| {name} | **{fmt(val)}** | {val / 1e9:.1f}x | {m} |")
    scale = sorted(glob.glob(os.path.join(ROOT, "SCALE_TPU*.json")))
    if scale:
        with open(scale[-1]) as f:
            s = json.load(f)
        gb = s.get("memory", {}).get("total_bytes", 0) / 1e9
        out += ["", f"Single-chip scale point (`{os.path.basename(scale[-1])}`): "
                f"{s.get('n_vars', '?'):,} variables, "
                f"{fmt(float(s.get('updates_per_s', 0)))} updates/s "
                f"(modes {'/'.join(s.get('modes', []))}, band_w "
                f"{s.get('band_w', 0)}), unpadded device image "
                f"{gb:.1f} GB."]
    return "\n".join(out)


def main():
    check = "--check" in sys.argv
    path = os.path.join(ROOT, "README.md")
    with open(path) as f:
        txt = f.read()
    if BEGIN not in txt or END not in txt:
        raise SystemExit("README markers missing")
    pre, rest = txt.split(BEGIN, 1)
    _, post = rest.split(END, 1)
    new = pre + BEGIN + "\n" + render() + "\n" + END + post
    if check:
        if new != txt:
            raise SystemExit(
                "README bench table out of date: run python "
                "tools/readme_bench.py")
        print("README bench table matches artifacts")
        return
    with open(path, "w") as f:
        f.write(new)
    print("README updated")


if __name__ == "__main__":
    main()
