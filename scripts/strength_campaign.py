"""Strength campaign: run the closed loop until the gated best model
beats the in-repo model-free heuristic engine, with ladder evidence.

VERDICT r3 Next #1: the round-3 campaign proved monotone improvement
(+594 Elo over init across 86 generations) but never overtook the
michi-style heuristic rollout engine — the reference's end state is an
engine that outplays handcrafted heuristics (its GNU Go games,
/root/reference/real_games/sgo_gnugo1.sgf:2; GNU Go is uninstallable
here, so the heuristic engine is the external-opponent standin).

This driver runs `--preset strength` generations on the TPU and
- tracks promotions; saves run state every generation (resumable);
- can seed an empty workdir from a committed checkpoint (--seed-from),
  continuing a previous leg the way runs/strength_r3b continued r3;
- probes the heuristic rung (quick duel, --probe-games) after every
  promotion and every --probe-every generations;
- stops with success once a confirm duel (--confirm-games, SGFs under
  <workdir>/duels/) reaches --target-winrate;
- also stops at --generations or --max-hours.

Training robustness (VERDICT r3 Next #3) is active through the
pipeline: non-finite updates are skipped in-jit, the phase crash-saves
'exit_backup' on abort, and the strength preset's ReduceLROnPlateau
drops the LR when the per-phase loss stalls.

Run: python scripts/strength_campaign.py --workdir runs/strength_r4 \
        --seed-from runs/strength_r3/sp_models/model_39.msgpack
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def seed_workdir(model_dir: str, seed_from: str) -> None:
    """Seed an empty store with a committed checkpoint as best+latest
    (model-level-checkpoint restart, reference model.py:125-157)."""
    name = os.path.splitext(os.path.basename(seed_from))[0]
    os.makedirs(model_dir, exist_ok=True)
    shutil.copyfile(seed_from, os.path.join(model_dir, name + ".msgpack"))
    with open(os.path.join(model_dir, "index.json"), "w") as f:
        json.dump({"best": name}, f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="runs/strength_r4")
    ap.add_argument("--generations", type=int, default=400)
    ap.add_argument("--seed-from", default=None,
                    help="checkpoint .msgpack to seed an empty workdir")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--probe-games", type=int, default=32)
    ap.add_argument("--confirm-games", type=int, default=64)
    ap.add_argument("--probe-every", type=int, default=16,
                    help="probe cadence in generations (also probes on "
                    "every promotion)")
    ap.add_argument("--target-winrate", type=float, default=0.5)
    ap.add_argument("--max-hours", type=float, default=0.0)
    ap.add_argument("--preset", choices=["strength", "xl"],
                    default="strength",
                    help="xl = strength_9x9_xl: 192 sims/move, calibrated "
                    "resignation live (round-5 scaled operating point)")
    ap.add_argument("--michi-rung", type=int, default=0,
                    help="also probe promotions vs the REAL michi/RAVE "
                    "engine at this sims budget (learn/duel_michi); the "
                    "rung doubles after each confirmed >=0.55 win, "
                    "climbing toward the reference budget 1400")
    ap.add_argument("--michi-probe-games", type=int, default=16)
    args = ap.parse_args()

    from sejonggo_tpu.config import strength_9x9, strength_9x9_xl
    from sejonggo_tpu.learn.duel import duel
    from sejonggo_tpu.pipeline import Pipeline
    from sejonggo_tpu.utils.metrics import setup_logging

    cfg = strength_9x9() if args.preset == "strength" else strength_9x9_xl()
    os.makedirs(args.workdir, exist_ok=True)
    model_dir = os.path.join(args.workdir, cfg.model_dir)
    if args.seed_from and not (os.path.isdir(model_dir)
                               and any(f.endswith(".msgpack")
                                       for f in os.listdir(model_dir))):
        seed_workdir(model_dir, args.seed_from)
    setup_logging(os.path.join(args.workdir, cfg.log_dir))
    pipe = Pipeline(cfg, args.workdir, seed=args.seed)
    resumed = pipe.load_run_state()
    pipe.init_models()
    start_best = pipe.store.best_name()
    print(json.dumps({"event": "campaign_start", "resumed": resumed,
                      "best": start_best,
                      "latest": pipe.store.latest_name()}), flush=True)

    def emit(line):
        print(json.dumps(line), flush=True)
        with open(os.path.join(args.workdir, "campaign.jsonl"), "a") as f:
            f.write(json.dumps(line) + "\n")

    def heuristic_duel(model, games, sgf_dir=None):
        t0 = time.time()
        res = duel(model, "heuristic", cfg=cfg, model_dir=model_dir,
                   games=games, sgf_dir=sgf_dir)
        emit({"event": "heuristic_probe", "model": model,
              "games": games, "winrate": res["winrate"],
              "elo": round(res["elo_diff_a_vs_b"], 1),
              "seconds": round(time.time() - t0, 1)})
        return res["winrate"]

    def michi_duel(model, games, sims, sgf_dir=None):
        t0 = time.time()
        res = duel(model, "michi", cfg=cfg, model_dir=model_dir,
                   games=games, michi_sims=sims, sgf_dir=sgf_dir,
                   max_moves=130)
        emit({"event": "michi_probe", "model": model, "michi_sims": sims,
              "games": games, "winrate": res["winrate"],
              "michi_resigns": res["michi_resigns"],
              "elo": round(res["elo_diff_a_vs_b"], 1),
              "seconds": round(time.time() - t0, 1)})
        return res["winrate"]

    t_start = time.time()
    promotions = []
    last_probed = None
    michi_rung = args.michi_rung
    done = False
    for gen in range(args.generations):
        t0 = time.time()
        prev_best = pipe.store.best_name()
        r = pipe.run(generations=1)[0]
        best = pipe.store.best_name()
        if best != prev_best:
            promotions.append(best)
        line = {
            "event": "generation", "gen": gen, "seconds":
            round(time.time() - t0, 1),
            "games": r["selfplay"]["games"],
            "moves": r["selfplay"]["moves"],
            "env_steps_per_s": round(r["selfplay"]["env_steps_per_s"], 1),
            "loss": round(r["train"].get("loss", float("nan")), 4),
            "policy_ce": round(r["train"].get("policy_ce", float("nan")), 4),
            "value_mse": round(r["train"].get("value_mse", float("nan")), 4),
            "lr": pipe.lr,
            "winrate": r["evaluate"].get("winrate"),
            "best": best, "promotions": len(promotions),
        }
        # calibrated-resignation telemetry (VERDICT r5: validate the
        # <=5% winner-resign property live + measure the speedup)
        sp = r["selfplay"]
        if sp.get("resign_threshold") is not None or sp.get("resigned_games"):
            line["resign_threshold"] = sp.get("resign_threshold")
            line["resigned_games"] = sp.get("resigned_games")
            line["winner_dip_rate"] = round(sp.get("winner_dip_rate", 0.0), 4)
        print(json.dumps(line), flush=True)
        with open(os.path.join(args.workdir, "campaign.jsonl"), "a") as f:
            f.write(json.dumps(line) + "\n")

        probe_due = (best != last_probed
                     and (best != prev_best
                          or (args.probe_every
                              and (gen + 1) % args.probe_every == 0)))
        if probe_due:
            last_probed = best
            if michi_rung:
                mwr = michi_duel(best, args.michi_probe_games, michi_rung)
                if mwr >= 0.55:
                    cwr = michi_duel(
                        best, 64, michi_rung,
                        sgf_dir=os.path.join(args.workdir, "duels",
                                             f"{best}_vs_michi{michi_rung}"))
                    if cwr >= 0.55:
                        emit({"event": "michi_rung_confirmed",
                              "model": best, "michi_sims": michi_rung,
                              "winrate": cwr})
                        michi_rung = min(michi_rung * 2, 1400) \
                            if michi_rung < 1400 else michi_rung
            wr = heuristic_duel(best, args.probe_games)
            if wr >= args.target_winrate:
                wr2 = heuristic_duel(
                    best, args.confirm_games,
                    sgf_dir=os.path.join(args.workdir, "duels",
                                         f"{best}_vs_heuristic"))
                if wr2 >= args.target_winrate:
                    emit({"event": "target_reached", "model": best,
                          "winrate": wr2})
                    done = True
                    break
        if args.max_hours and time.time() - t_start > args.max_hours * 3600:
            emit({"event": "wallclock_stop", "gen": gen})
            break

    emit({"event": "campaign_done", "reached_target": done,
          "promotions": promotions, "best": pipe.store.best_name(),
          "latest": pipe.store.latest_name(),
          "hours": round((time.time() - t_start) / 3600, 2)})


if __name__ == "__main__":
    main()
