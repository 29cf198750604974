#!/usr/bin/env python3
"""Run the compiled C++ reference over the validation grid and collect its
physics results as golden data for the 2-sigma cross-validation gate.

Grid (VERDICT round-1 item 2; reference README.md:87-111): 8x8 and 16x16,
beta in {1..6} at a safe mass m0=0.2, plus the near-critical point beta=2,
m0=-0.19 (m_crit(beta=2) = -0.1968(9), README.md:105). MD parameters follow
the reference's own validation choices (HMC_doc.pdf Fig. 1: tau=1, N=10 for
beta<5; tau=2, N=40 for beta>=5).

Each point runs in its own scratch dir (the SimData filename carries only
m0, not beta -- concurrent runs in one dir would interleave appends,
src/main.cpp:97-126). Results land in tests/golden/refphys.json plus the raw
SimData files under tests/golden/refphys/.

Usage: python tools/refcheck/run_goldens.py [--nmeas 2000] [--out tests/golden]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))


def build(ns: int, nt: int, workdir: str) -> str:
    out = subprocess.run(
        [os.path.join(HERE, "build_reference.sh"), str(ns), str(nt),
         os.path.join(workdir, f"build_{ns}x{nt}")],
        check=True, capture_output=True, text=True)
    return out.stdout.strip().splitlines()[-1]


def parse_simdata(path: str) -> dict:
    """Parse the reference _SimData.txt results block (src/main.cpp:163-172)."""
    with open(path) as f:
        lines = [l.rstrip("\n") for l in f]
    vals = {}
    for i, line in enumerate(lines):
        if line.startswith("#Ep"):
            ep, dep = lines[i + 1].split()
            vals["Ep"], vals["dEp"] = float(ep), float(dep)
        elif line.startswith("#gS"):
            gs, dgs = lines[i + 1].split()
            vals["gS"], vals["dgS"] = float(gs), float(dgs)
        elif line.startswith("#Acceptance"):
            vals["acceptance"] = float(lines[i + 1])
        elif line.startswith("#Execution"):
            vals["seconds"] = float(lines[i + 1])
    return vals


def run_point(binary: str, point: dict, scratch: str) -> dict:
    os.makedirs(scratch, exist_ok=True)
    params = "\n".join(str(v) for v in [
        1, 1, point["m0"], point["md_steps"], point["tau"], point["beta"],
        point["ntherm"], point["nmeas"], point["nsteps"], 0]) + "\n"
    subprocess.run([binary], input=params, cwd=scratch, check=True,
                   capture_output=True, text=True)
    sim = [f for f in os.listdir(scratch) if f.endswith("_SimData.txt")]
    assert len(sim) == 1, sim
    vals = parse_simdata(os.path.join(scratch, sim[0]))
    return {**point, **vals, "simdata": sim[0]}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nmeas", type=int, default=2000)
    ap.add_argument("--ntherm", type=int, default=500)
    ap.add_argument("--nsteps", type=int, default=1)
    ap.add_argument("--out", default=os.path.join(REPO, "tests", "golden"))
    ap.add_argument("--workdir", default="/tmp/refcheck")
    ap.add_argument("--point", action="append", default=None, metavar="SPEC",
                    help="run only custom point(s) 'Nx,Nt,beta,m0,md,tau' "
                         "(repeatable) and APPEND to an existing refphys.json "
                         "instead of regenerating the default grid")
    args = ap.parse_args()

    if args.point:
        points = []
        for spec in args.point:
            nx, nt, beta, m0, md, tau = spec.split(",")
            points.append(dict(Nx=int(nx), Nt=int(nt), beta=float(beta),
                               m0=float(m0), md_steps=int(md), tau=float(tau),
                               ntherm=args.ntherm, nmeas=args.nmeas,
                               nsteps=args.nsteps))
    else:
        points = []
        for L in (8, 16):
            for beta in (1, 2, 3, 4, 5, 6):
                md, tau = (10, 1.0) if beta < 5 else (40, 2.0)
                points.append(dict(Nx=L, Nt=L, beta=float(beta), m0=0.2,
                                   md_steps=md, tau=tau, ntherm=args.ntherm,
                                   nmeas=args.nmeas, nsteps=args.nsteps))
            # near-critical: m_crit(beta=2) = -0.1968(9) (README.md:105)
            points.append(dict(Nx=L, Nt=L, beta=2.0, m0=-0.19, md_steps=20,
                               tau=1.0, ntherm=args.ntherm, nmeas=args.nmeas,
                               nsteps=args.nsteps))

    binaries = {}
    os.makedirs(args.workdir, exist_ok=True)
    raw_dir = os.path.join(args.out, "refphys")
    os.makedirs(raw_dir, exist_ok=True)

    results = []
    if args.point:
        # custom points append to (and replace same-config rows of) the grid
        path = os.path.join(args.out, "refphys.json")
        if os.path.exists(path):
            with open(path) as f:
                prev = json.load(f)
            keys = {(p["Nx"], p["Nt"], p["beta"], p["m0"], p["md_steps"],
                     p["tau"]) for p in points}
            results = [r for r in prev
                       if (r["Nx"], r["Nt"], r["beta"], r["m0"],
                           r["md_steps"], r["tau"]) not in keys]
    for i, p in enumerate(points):
        key = (p["Nx"], p["Nt"])
        if key not in binaries:
            binaries[key] = build(p["Nx"], p["Nt"], args.workdir)
        tag = f"{p['Nx']}x{p['Nt']}_b{p['beta']:g}_m{p['m0']:g}"
        scratch = os.path.join(args.workdir, tag)
        shutil.rmtree(scratch, ignore_errors=True)
        print(f"[{i+1}/{len(points)}] {tag} ...", flush=True)
        r = run_point(binaries[key], p, scratch)
        print(f"    Ep={r['Ep']:.6f}+-{r['dEp']:.6f} acc={r['acceptance']:.3f}"
              f" ({r['seconds']:.1f}s)", flush=True)
        shutil.copy(os.path.join(scratch, r["simdata"]),
                    os.path.join(raw_dir, tag + "_SimData.txt"))
        r["simdata"] = os.path.join("refphys", tag + "_SimData.txt")
        results.append(r)
        with open(os.path.join(args.out, "refphys.json"), "w") as f:
            json.dump(results, f, indent=1)

    print(f"wrote {os.path.join(args.out, 'refphys.json')}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
