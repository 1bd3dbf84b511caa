"""KGS supervised pipeline tests (reference kgs_data_generator.py
semantics: one-hot policy targets incl. pass, ±1 values by winner,
handicap as forced-black setup moves)."""
import os

import numpy as np

from sejonggo_tpu.goenv import engine
from sejonggo_tpu.io.kgs import (
    kgs_sample_stream,
    load_kgs_directory,
    replay_sgf,
)

SIZE = 9
A = SIZE * SIZE + 1

GAME = "(;GM[1]FF[4]SZ[9]KM[5.5]RE[B+2.5];B[cc];W[gg];B[cf];W[];B[ff])"
HANDI = "(;GM[1]FF[4]SZ[9]KM[0.5]HA[2]RE[W+R]AB[cc][gg];W[ee];B[cf])"


def test_replay_sgf_samples():
    samples = replay_sgf(GAME, SIZE)
    assert len(samples) == 5
    # first sample: empty board, policy one-hot at (2,2)
    assert samples[0]["board"].sum() == samples[0]["board"][:, :, 16].sum()
    assert samples[0]["policy"][2 * SIZE + 2] == 1.0
    assert samples[0]["policy"].sum() == 1.0
    # pass move -> mass on the last index
    assert samples[3]["policy"][A - 1] == 1.0
    # values: B won -> +1 for black's moves, -1 for white's
    assert [float(s["value"]) for s in samples] == [1.0, -1.0, 1.0, -1.0, 1.0]
    # boards replay correctly: second sample's board has the first stone
    assert samples[1]["board"][2, 2, 1] == 1  # black stone, white to move
    # wrong board size skipped
    assert replay_sgf(GAME.replace("SZ[9]", "SZ[19]"), SIZE) == []


def test_replay_handicap():
    samples = replay_sgf(HANDI, SIZE)
    assert len(samples) == 2
    b0 = samples[0]["board"]
    # handicap stones on the board before white's first move; white to move
    real = np.where(b0[:, :, 16] == 1, b0[:, :, 0] - b0[:, :, 1],
                    b0[:, :, 1] - b0[:, :, 0])
    assert real[2, 2] == 1 and real[6, 6] == 1
    # white moves first and won by resign -> +1 for white
    assert samples[0]["player"] == -1
    assert float(samples[0]["value"]) == 1.0
    assert float(samples[1]["value"]) == -1.0


def test_stream_and_directory_loading(tmp_path):
    for i in range(3):
        with open(tmp_path / f"g{i}.sgf", "w") as f:
            f.write(GAME)
    with open(tmp_path / "broken.sgf", "w") as f:
        f.write("not an sgf at all ;;;[")

    boards, policies, values = load_kgs_directory(str(tmp_path), SIZE)
    assert boards.shape[0] == 15  # 3 games x 5 moves (broken skipped)
    assert policies.shape == (15, A)

    batches = list(kgs_sample_stream(str(tmp_path), SIZE, batch_size=4))
    assert len(batches) == 3  # 15 samples -> 3 full batches of 4
    bb, pp, vv = batches[0]
    assert bb.shape == (4, SIZE, SIZE, 17) and bb.dtype == np.float32
    assert set(np.unique(vv)) <= {1.0, -1.0}


def test_kgs_pretrain_phase(tmp_path):
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_pipeline import micro_config
    from sejonggo_tpu.pipeline import Pipeline

    data = tmp_path / "kgs"
    data.mkdir()
    for i in range(2):
        with open(data / f"g{i}.sgf", "w") as f:
            f.write(GAME)
    pipe = Pipeline(micro_config(), str(tmp_path), seed=0)
    pipe.init_models()
    stats = pipe.kgs_pretrain_phase(str(data), steps=3, backup_every=2)
    assert stats["steps"] == 3
    assert stats["to"] == "model_2"
    assert np.isfinite(stats["loss"])
    assert pipe.store.exists("model_2")
    assert pipe.store.exists("backup")


def test_scrape_links_filters_and_dedupes():
    from sejonggo_tpu.io.kgs import scrape_links

    html = (
        '<a href="https://example.org/games/a.sgf">a</a>'
        '<a href="http://example.org/games/b.sgf">b</a>'
        '<a href="https://example.org/games/a.sgf">dup</a>'
        '<a href="https://example.org/index.html">idx</a>'
    )
    links = scrape_links(html, ".sgf")
    assert links == ["https://example.org/games/a.sgf",
                     "http://example.org/games/b.sgf"]
    assert len(scrape_links(html)) == 3


def test_download_index_unreachable_returns_zero(tmp_path):
    from sejonggo_tpu.io.kgs import download_index

    assert download_index("http://127.0.0.1:1/none.html",
                          str(tmp_path)) == 0
