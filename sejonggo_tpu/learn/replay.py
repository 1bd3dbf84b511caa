"""Sliding-window replay buffer.

Replaces the reference's one-HDF5-file-per-move tree
(sgfsave.py:49-79) + directory-walking window with deletion
(data_generator.py:43-78, N_MOST_RECENT_GAMES).  Samples are kept in a
host-side ring buffer over MOVES; the window drops the oldest moves as
new games stream in, which is the same most-recent-games semantics at
scale without filesystem churn.  Boards are stored int8 (17 planes),
policy targets sparse-dense f32, value targets f32.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np


class ReplayBuffer:
    def __init__(self, capacity_moves: int, size: int, seed: int = 0):
        self.capacity = int(capacity_moves)
        self.size = size
        a = size * size + 1
        self.boards = np.zeros((self.capacity, size, size, 17), np.int8)
        self.policies = np.zeros((self.capacity, a), np.float32)
        self.values = np.zeros((self.capacity,), np.float32)
        self.cursor = 0
        self.filled = 0
        self.total_games = 0
        self.total_moves = 0
        self._rng = np.random.RandomState(seed)

    def __len__(self) -> int:
        return self.filled

    def add_game_batch(self, games) -> int:
        """Ingest a finished actor GameBatch; returns moves added."""
        vt = games.value_targets()  # (T, B)
        t, b = games.move_valid.shape
        mask = games.move_valid
        boards = games.boards[mask]
        policies = games.policy_targets[mask]
        values = vt[mask]
        self._append(boards, policies, values)
        self.total_games += b
        self.total_moves += int(mask.sum())
        return int(mask.sum())

    def add_game(self, game: dict) -> int:
        """Ingest one continuous-actor game dict (stacked per-move
        arrays: boards (T,N,N,17), policies (T,A), players (T,) plus the
        scalar winner; see ContinuousSelfPlay._harvest_game)."""
        boards = np.asarray(game["boards"])
        t = boards.shape[0]
        if t == 0:
            return 0
        w = int(game["winner"])
        players = np.asarray(game["players"])
        values = (np.zeros(t, np.float32) if w == 0
                  else np.where(players == w, 1.0, -1.0).astype(np.float32))
        self._append(boards, np.asarray(game["policies"]), values)
        self.total_games += 1
        self.total_moves += t
        return t

    def _append(self, boards, policies, values):
        n = boards.shape[0]
        idx = (self.cursor + np.arange(n)) % self.capacity
        self.boards[idx] = boards
        self.policies[idx] = policies
        self.values[idx] = values
        self.cursor = int((self.cursor + n) % self.capacity)
        self.filled = int(min(self.filled + n, self.capacity))

    def sample(self, batch_size: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Uniform sample over the window (reference train.py:44-60 picks
        random move files per step)."""
        idx = self._rng.randint(0, self.filled, size=batch_size)
        return (
            self.boards[idx].astype(np.float32),
            self.policies[idx],
            self.values[idx],
        )

    # --- persistence (part of checkpoint/resume; the reference never
    # checkpoints its replay window, SURVEY.md §5) -----------------------

    def save(self, path: str) -> None:
        np.savez_compressed(
            path,
            boards=self.boards[: self.filled],
            policies=self.policies[: self.filled],
            values=self.values[: self.filled],
            cursor=self.cursor, filled=self.filled,
            total_games=self.total_games, total_moves=self.total_moves,
        )

    @classmethod
    def load(cls, path: str, capacity_moves: int, size: int,
             seed: int = 0) -> "ReplayBuffer":
        buf = cls(capacity_moves, size, seed)
        with np.load(path) as z:
            n = int(z["filled"])
            n = min(n, buf.capacity)
            buf.boards[:n] = z["boards"][:n]
            buf.policies[:n] = z["policies"][:n]
            buf.values[:n] = z["values"][:n]
            buf.filled = n
            buf.cursor = int(z["cursor"]) % buf.capacity
            buf.total_games = int(z["total_games"])
            buf.total_moves = int(z["total_moves"])
        return buf
