"""GTP (Go Text Protocol) frontend.

Reference counterpart: sejonggo.py — SejongGoEngine (board + reusable
MCTS tree across moves, sejonggo.py:19-69) and GTPEngine (getattr
command dispatch over stdin/stdout, sejonggo.py:71-178), including the
skipped-letter-'I' vertex convention (sejonggo.py:102-126).  The
reference needed a separate prediction-service build
(sejonggo_nomodel.py); here inference is the same in-process jitted
call as everywhere else.

Run: python -m sejonggo_tpu.io.gtp --preset tiny [--dummy | --model-dir DIR]
"""
from __future__ import annotations

import argparse
import sys
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sejonggo_tpu.config import (Config, SearchConfig, full_19x19,
                                 small_9x9, strength_9x9)
from sejonggo_tpu.goenv import (
    engine,
    gtp_to_xy,
    xy_to_gtp,
)
from sejonggo_tpu.search import (
    advance_root_batch,
    decide_batch,
    new_tree_batch,
    policy_target_batch,
    run_search,
)

COLOR_TO_PLAYER = {"B": 1, "W": -1, "b": 1, "w": -1}


class GoEngine:
    """Single-game engine: board + reusable tree (sejonggo.py:19-69)."""

    def __init__(self, predict, variables, *, size: int, komi: float,
                 search: SearchConfig, resign: Optional[float] = None,
                 temperature: int = 0, add_noise: bool = False, seed: int = 0):
        self.predict = predict
        self.variables = variables
        self.size = size
        self.komi = komi
        self.search = search
        self.resign = resign
        self.temperature = temperature
        self.add_noise = add_noise
        self.rng = jax.random.PRNGKey(seed)
        self._search_fn = lambda boards: self.predict(self.variables, boards)
        self.clear()

    def clear(self):
        self.board = engine.init_board(self.size)
        self.tree = None
        self.tree_valid = False
        self.move_n = 0

    def _split(self):
        self.rng, sub = jax.random.split(self.rng)
        return sub

    @property
    def player(self) -> int:
        return int(self.board[0, 0, 16])

    def play(self, color: int, x: int, y: int, update_tree: bool = True):
        """Apply an external (or own) move; advance the reused tree if
        it knows this child, else drop it (sejonggo.py:34-45)."""
        action = self.size * self.size if y >= self.size else y * self.size + x
        new_board, _ = engine.play_at(self.board, x, y, color)
        if update_tree and self.tree_valid:
            trees, valid = advance_root_batch(
                self.tree, jnp.asarray([action]), new_board[None],
                reserve=self.search.simulations)
            self.tree = trees
            self.tree_valid = bool(valid[0])
        else:
            self.tree_valid = False
        self.board = new_board
        self.move_n += 1
        return self.board

    def genmove(self, color: int):
        """Returns (x, y, value); y == size means pass, y == size+1 means
        resign (reference sejonggo.py:47-69 marker)."""
        if self.player != color:
            # force the side to move like make_play(color=...) does
            self.board = engine._swap_sides(self.board)
        feats = self.board[None].astype(jnp.float32)
        policies, values = self.predict(self.variables, feats)
        value = float(values[0, 0])
        if self.resign is not None and value <= self.resign:
            return 0, self.size + 1, value

        if not self.tree_valid:
            self.tree = new_tree_batch(
                policies, self.board[None], self.search.capacity(),
                rng=self._split() if self.add_noise else None,
                dirichlet_alpha=self.search.dirichlet_alpha,
                epsilon=self.search.dirichlet_epsilon)
            self.tree_valid = True

        self.tree = run_search(
            self.tree, self._search_fn, self._split(),
            simulations=self.search.simulations,
            batch_size=self.search.batch_size,
            c_puct=self.search.c_puct, negamax=self.search.negamax,
            use_symmetry=self.search.use_symmetry)
        greedy = jnp.asarray([self.temperature == 0])
        action = int(decide_batch(self.tree, greedy, self._split())[0])
        x, y = (action % self.size, action // self.size) \
            if action < self.size * self.size else (0, self.size)
        self.play(color, x, y)
        return x, y, value


class MichiEngine:
    """Single-game michi-style engine (model-free RAVE search).

    The reference's mcts1/ engine had no frontend at all (never imported
    by the pipeline); here it speaks the same GTP protocol as the
    network engine.  Resigns below MichiConfig.resign_thres
    (conf.py:89 RESIGN_THRES)."""

    def __init__(self, *, size: int, komi: float, michi=None, seed: int = 0,
                 spat_file: Optional[str] = None,
                 prob_file: Optional[str] = None):
        import types

        from sejonggo_tpu.config import MichiConfig
        from sejonggo_tpu.search.patterns import PatternStore

        self.size = size
        self.komi = komi
        self.cfg = michi or MichiConfig(komi=komi)
        self.search = types.SimpleNamespace(simulations=self.cfg.n_sims)
        self.rng = jax.random.PRNGKey(seed)
        self._genmove_jit = None
        self._jit_key = None
        # optional pachi-format large patterns (reference conf.py:85-86;
        # inert when files are absent, exactly like the reference)
        self.patterns = PatternStore()
        if spat_file and prob_file:
            self.patterns.load_spat(spat_file)
            self.patterns.load_probs(prob_file)
        self.clear()

    def clear(self):
        self.board = engine.init_board(self.size)
        self.move_n = 0
        self.last_action = -1

    @property
    def player(self) -> int:
        return int(self.board[0, 0, 16])

    def _split(self):
        self.rng, sub = jax.random.split(self.rng)
        return sub

    def play(self, color: int, x: int, y: int, update_tree: bool = True):
        self.board, _ = engine.play_at(self.board, x, y, color)
        self.last_action = (self.size * self.size if y >= self.size
                            else y * self.size + x)
        self.move_n += 1
        return self.board

    def genmove(self, color: int):
        """Returns (x, y, winrate); y == size means pass, y == size + 1
        means resign."""
        import dataclasses as _dc

        from sejonggo_tpu.search.michi import MichiSearcher

        if self.player != color:
            self.board = engine._swap_sides(self.board)
        # searcher cache key includes everything the closure captures
        # (cfg via komi) so a post-hoc change rebuilds instead of
        # silently reusing a stale closure.  MichiSearcher runs the
        # search host-chunked — mandatory on the axon TPU tunnel, which
        # kills single device programs over ~1 min (a full 1400-sim
        # search is minutes), and a no-op semantically on CPU.
        jit_key = (self.komi, bool(self.patterns))
        if self._genmove_jit is None or self._jit_key != jit_key:
            cfg = _dc.replace(self.cfg, komi=self.komi)
            lut = None
            if self.patterns:
                # small-radius patterns reach EVERY in-tree expansion
                # via the device LUT (tree_node.py:81-86 parity); the
                # full-radius host matcher still boosts the root below
                from sejonggo_tpu.search.pattern_lut import \
                    build_small_pattern_lut

                lut = build_small_pattern_lut(self.patterns)
            self._genmove_jit = MichiSearcher(cfg, pattern_lut=lut)
            self._jit_key = jit_key
        # the opponent's (or our previous) move drives the root CFG
        # locality prior, the reference's largest prior weights
        last = jnp.asarray([self.last_action], jnp.int32)
        if self.patterns:
            from sejonggo_tpu.search.patterns import root_prior_bonus

            bonus = root_prior_bonus(self.patterns, self.board,
                                     self.cfg.prior_largepattern)
            acts, wrs = self._genmove_jit.genmove(
                self.board[None], self._split(), last, bonus[None])
        else:
            acts, wrs = self._genmove_jit.genmove(
                self.board[None], self._split(), last)
        action, wr = int(acts[0]), float(wrs[0])
        if wr < self.cfg.resign_thres:
            return 0, self.size + 1, wr
        x, y = (action % self.size, action // self.size) \
            if action < self.size * self.size else (0, self.size)
        self.play(color, x, y)
        return x, y, wr


class GTPFrontend:
    """GTP v2 command loop (reference GTPEngine sejonggo.py:71-160)."""

    def __init__(self, engine_: GoEngine, name: str = "sejonggo-tpu"):
        self.engine = engine_
        self._name = name
        self._komi = engine_.komi
        self._quit = False

    # --- commands ------------------------------------------------------

    def protocol_version(self):
        return "2"

    def name(self):
        return f"{self._name} - {self.engine.search.simulations} simulations"

    def version(self):
        from sejonggo_tpu import __version__

        return __version__

    def list_commands(self):
        return "\n".join(
            c for c in dir(self)
            if not c.startswith("_") and callable(getattr(self, c))
            and c not in ("parse_command", "run"))

    def known_command(self, name):
        """GTP v2 §6.3.4 capability probe (GoGui/Sabaki issue it before
        using optional commands; the reference frontend lacks it and
        relies on the GUI falling back to list_commands)."""
        return ("true" if name in self.list_commands().split("\n")
                else "false")

    def boardsize(self, size):
        if int(size) != self.engine.size:
            raise ValueError(
                f"configured for {self.engine.size}x{self.engine.size}, "
                f"GTP asked for {size}x{size}")
        return ""

    def komi(self, komi):
        self._komi = float(komi)
        self.engine.komi = float(komi)
        return ""

    def clear_board(self):
        self.engine.clear()
        return ""

    def play(self, color, vertex):
        player = COLOR_TO_PLAYER[color[0]]
        x, y = gtp_to_xy(vertex, self.engine.size)
        self.engine.play(player, x, y)
        return ""

    def genmove(self, color):
        player = COLOR_TO_PLAYER[color[0]]
        x, y, value = self.engine.genmove(player)
        if y == self.engine.size + 1:
            return "resign"
        return xy_to_gtp(x, y, self.engine.size)

    def showboard(self):
        return "\n" + engine.show_board(self.engine.board)

    def final_score(self):
        w, b, wh = engine.score(self.engine.board, self._komi)
        w = int(w)
        if w == 0:
            return "0"
        return ("B+" if w == 1 else "W+") + str(abs(float(b) - float(wh)))

    def sg_showtree(self, max_depth="2", top_k="5"):
        """Debug dump of the reused search tree + consistency check
        (reference show_tree/tree_depth play.py:355-374; private
        extension command, hence the sg_ prefix)."""
        from sejonggo_tpu.search import tree_debug

        t = getattr(self.engine, "tree", None)
        if t is None or not getattr(self.engine, "tree_valid", False):
            return "no tree (genmove first)"
        if not hasattr(t, "child_idx"):
            return "engine has no array tree"
        ht = tree_debug.extract_tree(t, 0)
        out = tree_debug.show_tree(ht, self.engine.size,
                                   int(max_depth), int(top_k))
        problems = tree_debug.check_consistency(ht)
        if problems:
            out += "\nINCONSISTENT: " + "; ".join(problems[:5])
        pv = tree_debug.principal_variation(ht, self.engine.size)
        out += "\npv: " + " ".join(c for c, _, _ in pv)
        return "\n" + out

    def quit(self):
        self._quit = True
        return ""

    # --- loop ----------------------------------------------------------

    def parse_command(self, line: str) -> str:
        tokens = line.strip().split()
        if not tokens:
            return ""
        cmd_id = ""
        if tokens[0].isdigit():
            cmd_id = tokens[0]
            tokens = tokens[1:]
        command, args = tokens[0], tokens[1:]
        try:
            method = getattr(self, command)
            result = method(*args)
        except Exception as e:  # noqa: BLE001 — GTP reports errors inline
            return f"?{cmd_id} {e}\n\n"
        if not str(result).strip():
            return f"={cmd_id}\n\n"
        return f"={cmd_id} {result}\n\n"

    def run(self, infile=sys.stdin, outfile=sys.stdout):
        for line in infile:
            for cmd in line.split("\n"):
                if not cmd.strip():
                    continue
                result = self.parse_command(cmd)
                if result.strip():
                    outfile.write(result)
                    outfile.flush()
            if self._quit:
                break


def _build_engine(args):
    cfg: Config = {"tiny": small_9x9, "strength": strength_9x9,
                   "full": full_19x19}[args.preset]()
    if getattr(args, "engine", "net") == "michi":
        from sejonggo_tpu.config import MichiConfig

        michi = MichiConfig(komi=cfg.go.komi, n_sims=args.sims) \
            if args.sims else MichiConfig(komi=cfg.go.komi)
        return MichiEngine(size=cfg.go.size, komi=cfg.go.komi, michi=michi,
                           spat_file=getattr(args, "spat", None),
                           prob_file=getattr(args, "prob", None))
    if args.dummy or getattr(args, "engine", "net") == "dummy":
        from sejonggo_tpu.nets import dummy_actor_fn

        return GoEngine(dummy_actor_fn, None, size=cfg.go.size,
                        komi=cfg.go.komi, search=cfg.search)
    from sejonggo_tpu.learn import CheckpointStore, make_optimizer
    from sejonggo_tpu.learn.train import init_train_state
    from sejonggo_tpu.nets import AZNet, init_variables, make_predict_fn

    net = AZNet.from_config(cfg.go.size, cfg.net)
    store = CheckpointStore(args.model_dir)
    name = args.checkpoint or store.best_name() or store.latest_name()
    if name is None:
        raise SystemExit(f"no checkpoint found in {args.model_dir}")
    tx = make_optimizer()
    template = init_train_state(net, init_variables(net, jax.random.PRNGKey(0)), tx)
    variables = store.load_variables(name, template)
    return GoEngine(make_predict_fn(net), variables, size=cfg.go.size,
                    komi=cfg.go.komi, search=cfg.search)


def main():
    parser = argparse.ArgumentParser(description="sejonggo-tpu GTP engine")
    parser.add_argument("--preset", choices=["tiny", "strength", "full"],
                        default="full")
    parser.add_argument("--model-dir", default="sp_models")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--dummy", action="store_true",
                        help="play with the deterministic stub net")
    parser.add_argument("--engine", choices=["net", "dummy", "michi"],
                        default="net",
                        help="michi = model-free RAVE engine (mcts1 parity)")
    parser.add_argument("--sims", type=int, default=0,
                        help="override simulations for --engine michi")
    parser.add_argument("--spat", default=None,
                        help="pachi .spat pattern file for --engine michi")
    parser.add_argument("--prob", default=None,
                        help="pachi .prob pattern file for --engine michi")
    args = parser.parse_args()
    engine_ = _build_engine(args)
    frontend = GTPFrontend(engine_)
    print("GTP engine ready", file=sys.stderr)
    frontend.run()


if __name__ == "__main__":
    main()
