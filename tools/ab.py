#!/usr/bin/env python3
"""Interleaved commit-level A/B bench — the adjudication instrument that
settled the round-10 five-flag class and the g3/g3b pair, mechanized
(VERDICT r10 item 3: round 10 hand-assembled this twice, tmp/scale/
r10_ab.log and r10_ab_g3.log, and both times it was decisive where
point probes were not).

Protocol: build the reference commit in a detached git worktree under
tmp/ (gitignored), then alternate filtered Bench runs HEAD <-> ref in
the SAME host window for N rounds. Because the arms interleave
minute-to-minute, a host window inflates both arms together and the
HEAD/ref ratio stays clean even when absolute numbers are 2x floor —
the property that kills (or confirms) a regression hypothesis in one
sweep, without waiting for a quiet window.

Reading the output: per-query minima across rounds per arm, plus the
HEAD/ref ratio. ratio <= ~1.05 on every query => no regression between
the commits (elevation, if any, is host state — check the witness
panels carried per run). ratio >> 1 on a query => real; bisect between
the commits. Each run's full bench line (with cpu_ref / mem_ref_during
/ stage_ref witnesses) is kept so the window itself stays auditable.

Usage:
  python3 tools/ab.py REF_COMMIT FILTER_REGEX [ROUNDS] \\
      [--sf DIR] [--reps N] [--cpus N] [--label NAME] [--env K=V ...]

  REF_COMMIT    commit-ish to compare HEAD against (e.g. the last round's
                closing commit)
  FILTER_REGEX  SPARK_GRAFT_BENCH_FILTER value, e.g. '^(g3_isochrone)$'
  ROUNDS        interleave rounds (default 3; each runs both arms once)
  --sf DIR      scale dir (default /root/testdata/sf0.1), resolved to an
                absolute path so the ref worktree reads the same corpus
  --env K=V     extra env for BOTH arms (e.g. SPARK_DRIVER_MEM=56g)

Output: markdown table on stdout; full JSON (runs + minima + ratios)
to tmp/scale/ab_<label>.json; per-run sbt logs next to it.
"""
import json, os, re, subprocess, sys, time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WT = os.path.join(REPO, "tmp", "abwt")
WITNESS_KEYS = ["cpu_ref_sec", "cpu_ref_mt_sec", "mem_ref_sec",
                "mem_ref_mt_sec", "stage_ref_sec", "cpu_ref_during",
                "mem_ref_during", "quiet_gate"]


def sh(args, cwd=REPO, check=True, capture=False):
    r = subprocess.run(args, cwd=cwd, check=check,
                       capture_output=capture, text=True)
    return r.stdout.strip() if capture else None


def parse_bench_line(log_path):
    """First '"metric"' line in the log = the compact bench JSON."""
    with open(log_path, errors="replace") as f:
        for line in f:
            if '"metric"' in line:
                m = re.search(r'\{.*\}', line)
                if m:
                    try:
                        return json.loads(m.group(0))
                    except json.JSONDecodeError:
                        pass
    return None


def main():
    args = [a for a in sys.argv[1:]]
    opts = {"sf": "/root/testdata/sf0.1", "reps": "3", "cpus": "32",
            "label": None}
    extra_env, pos = {}, []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--env":
            k, _, v = args[i + 1].partition("=")
            extra_env[k] = v
            i += 2
        elif a.startswith("--"):
            opts[a[2:]] = args[i + 1]
            i += 2
        else:
            pos.append(a)
            i += 1
    if len(pos) < 2:
        raise SystemExit(__doc__)
    ref_ish, filt = pos[0], pos[1]
    rounds = int(pos[2]) if len(pos) > 2 else 3
    sf_dir = os.path.abspath(opts["sf"])
    ref_sha = sh(["git", "rev-parse", ref_ish], capture=True)
    head_sha = sh(["git", "rev-parse", "HEAD"], capture=True)
    label = opts["label"] or f"{ref_ish.replace('/', '_')}_{int(time.time())}"
    out_json = os.path.join(REPO, "tmp", "scale", f"ab_{label}.json")
    os.makedirs(os.path.dirname(out_json), exist_ok=True)

    # Worktree for the ref arm: reuse if already at the right sha (a prior
    # A/B against the same commit), else recreate. Detached, under the
    # gitignored tmp/ so it never shows up as repo state.
    cur = None
    if os.path.isdir(WT):
        try:
            cur = sh(["git", "rev-parse", "HEAD"], cwd=WT, capture=True)
        except subprocess.CalledProcessError:
            pass
    if cur != ref_sha:
        if os.path.isdir(WT):
            sh(["git", "worktree", "remove", "--force", WT], check=False)
        sh(["git", "worktree", "add", "--detach", WT, ref_sha])
    print(f"[ab] HEAD {head_sha[:10]} vs ref {ref_sha[:10]} ({ref_ish}); "
          f"filter {filt}; {rounds} rounds; sf {sf_dir}", flush=True)

    # Pre-build both arms OUTSIDE the timed window so round 1 isn't an
    # arm-asymmetric compile.
    for arm_dir in (REPO, WT):
        sh(["sbt", "-batch", "compile"], cwd=arm_dir)

    env_base = dict(os.environ)
    env_base.update({"SPARK_GRAFT_SF_DIR": sf_dir,
                     "SPARK_GRAFT_CPUS": opts["cpus"],
                     "SPARK_GRAFT_BENCH_REPS": opts["reps"],
                     "SPARK_GRAFT_BENCH_FILTER": filt})
    env_base.update(extra_env)

    runs = []
    for rnd in range(1, rounds + 1):
        for arm, arm_dir, sha in (("head", REPO, head_sha),
                                  ("ref", WT, ref_sha)):
            log = os.path.join(REPO, "tmp", "scale",
                               f"ab_{label}_{arm}_r{rnd}.log")
            t0 = time.strftime("%FT%TZ", time.gmtime())
            with open(log, "w") as lf:
                subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                               cwd=arm_dir, env=env_base,
                               stdout=lf, stderr=subprocess.STDOUT)
            rec = parse_bench_line(log)
            if rec is None:
                print(f"[ab] round {rnd} {arm}: NO BENCH LINE ({log})",
                      flush=True)
                continue
            row = {"round": rnd, "arm": arm, "sha": sha, "started": t0,
                   "total": rec.get("value"), "errors": rec.get("errors"),
                   "queries": rec.get("queries", {})}
            row.update({k: rec[k] for k in WITNESS_KEYS if k in rec})
            runs.append(row)
            print(f"[ab] round {rnd} {arm}: total {row['total']} "
                  f"mem_during {row.get('mem_ref_during')}", flush=True)

    # Per-query minima per arm (the floor-protocol reading), then ratios.
    minima = {"head": {}, "ref": {}}
    for r in runs:
        for q, v in r["queries"].items():
            if v is None or v < 0:
                continue
            cur = minima[r["arm"]].get(q)
            minima[r["arm"]][q] = v if cur is None else min(cur, v)
    qs = sorted(set(minima["head"]) | set(minima["ref"]))
    ratios = {}
    for q in qs:
        h, f = minima["head"].get(q), minima["ref"].get(q)
        ratios[q] = round(h / f, 3) if h and f else None

    verdict = ("no-regression" if ratios and
               all(v is not None and v <= 1.05 for v in ratios.values())
               else "inspect")
    result = {"head_sha": head_sha, "ref_sha": ref_sha, "ref_ish": ref_ish,
              "filter": filt, "rounds": rounds, "sf": sf_dir,
              "reps": int(opts["reps"]), "extra_env": extra_env,
              "minima": minima, "head_over_ref": ratios,
              "verdict": verdict, "runs": runs}
    with open(out_json, "w") as f:
        json.dump(result, f, indent=1)

    print(f"\n| query | HEAD min | ref min | HEAD/ref |")
    print("|---|---|---|---|")
    for q in qs:
        print(f"| {q} | {minima['head'].get(q)} | {minima['ref'].get(q)} "
              f"| {ratios[q]} |")
    print(f"\nverdict: {verdict} (<=1.05 on every query => no regression; "
          f"elevation shared by both arms is host state)")
    print(f"full record: {out_json}")


if __name__ == "__main__":
    main()
