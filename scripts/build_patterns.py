"""Harvest a pachi-format spatial pattern store from our own SGFs.

VERDICT r4 Missing #3 / Next #8: the reference applies a gridcular
large-pattern prior at every node expansion (mcts1/tree_node.py:81-86)
but ships no patterns.spat/patterns.prob, so the subsystem is inert
there.  This script makes it REAL here: it replays the repo's committed
self-play/duel SGFs, estimates per-pattern play probabilities, and
writes pachi-format files that `search/patterns.py` (host matcher) and
`search/pattern_lut.py` (device-side expansion prior) both consume.

Estimator: at every recorded position, the played point is a positive
and `--negatives` random empty points are negatives; for each gridcular
diameter <= --max-diameter the canonical (lexicographically smallest
rotation) neighborhood string accumulates seen/played counts;
prob = played / seen for patterns seen >= --min-seen times.

Run: python scripts/build_patterns.py --out-dir runs/patterns_r5 \
        --sgf-dirs runs/strength_r4/duels runs/strength_r4b/duels
"""
from __future__ import annotations

import argparse
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def canonical_neighborhoods(chars, y, x, max_groups):
    """Per diameter group, the canonical (min over the 8 rotations)
    cumulative neighborhood string (patterns.gridcular_neighborhoods
    ordering)."""
    from sejonggo_tpu.search.patterns import GRIDCULAR_SEQ, _ROTATIONS

    n = chars.shape[0]
    acc = ["" for _ in _ROTATIONS]
    out = []
    for dseq in GRIDCULAR_SEQ[:max_groups]:
        for ri, (idx, sgn) in enumerate(_ROTATIONS):
            for o in dseq:
                yy = y + o[idx[0]] * sgn[0]
                xx = x + o[idx[1]] * sgn[1]
                acc[ri] += (chars[yy, xx] if 0 <= yy < n and 0 <= xx < n
                            else " ")
        out.append(min(acc))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sgf-dirs", nargs="+", required=True)
    ap.add_argument("--out-dir", default="runs/patterns_r5")
    ap.add_argument("--max-diameter-groups", type=int, default=4,
                    help="gridcular diameter groups to harvest (4 = "
                    "13+8 points, covers the device LUT radius)")
    ap.add_argument("--negatives", type=int, default=4)
    ap.add_argument("--min-seen", type=int, default=8)
    ap.add_argument("--max-games", type=int, default=400)
    ap.add_argument("--size", type=int, default=9)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from sejonggo_tpu.io.kgs import iter_sgf_files, replay_sgf

    rng = np.random.RandomState(args.seed)
    seen = defaultdict(int)
    played = defaultdict(int)
    games = 0
    positions = 0
    for d in args.sgf_dirs:
        for path in sorted(iter_sgf_files(d)):
            if games >= args.max_games:
                break
            try:
                with open(path, errors="replace") as f:
                    samples = replay_sgf(f.read(), args.size)
            except Exception:  # noqa: BLE001 — skip unparseable, like kgs.py
                continue
            games += 1
            for s in samples:
                board = s["board"]
                n = board.shape[0]
                move = int(np.argmax(s["policy"]))
                if move >= n * n:
                    continue
                own = np.asarray(board[:, :, 0] == 1)
                opp = np.asarray(board[:, :, 1] == 1)
                chars = np.full((n, n), ".", dtype="<U1")
                chars[own] = "X"
                chars[opp] = "x"
                empties = np.flatnonzero(~(own | opp).reshape(-1))
                negs = rng.choice(empties, size=min(args.negatives,
                                                    len(empties)),
                                  replace=False)
                pts = {int(move)} | {int(q) for q in negs}
                positions += 1
                for p in pts:
                    y, x = divmod(p, n)
                    for nb in canonical_neighborhoods(
                            chars, y, x, args.max_diameter_groups):
                        seen[nb] += 1
                        if p == move:
                            played[nb] += 1

    os.makedirs(args.out_dir, exist_ok=True)
    spat_path = os.path.join(args.out_dir, "patterns.spat")
    prob_path = os.path.join(args.out_dir, "patterns.prob")
    kept = 0
    with open(spat_path, "w") as fs, open(prob_path, "w") as fp:
        fs.write("# synthesized from repo self-play SGFs "
                 f"(games={games}, positions={positions})\n")
        for i, (nb, cnt) in enumerate(
                sorted(seen.items(), key=lambda kv: -kv[1])):
            if cnt < args.min_seen:
                continue
            prob = played[nb] / cnt
            pid = kept + 1
            # .spat line: <id> <size> <pattern> ; loader reads parts[2]
            fs.write(f"{pid} {len(nb)} {nb.replace(' ', '#')}\n")
            # .prob line: <prob> <n> <m> (s:<id>)
            fp.write(f"{prob:.6f} {cnt} {played[nb]} (s:{pid})\n")
            kept += 1
    print(f"games={games} positions={positions} patterns kept={kept} "
          f"-> {spat_path}, {prob_path}")


if __name__ == "__main__":
    main()
