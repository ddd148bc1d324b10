"""Unit tests of the beam span-merge (extraction/merge.py)."""

from __future__ import annotations

from manga_ocr_spark.extraction.dom import Block
from manga_ocr_spark.extraction.merge import beam_merge


def _blk(i: int, score: float, keep: bool = True) -> Block:
    return Block(
        block_id=i,
        tag="p",
        depth=1,
        text=f"t{i}",
        text_len=max(1, int(abs(score))),
        link_text_len=0,
        in_boilerplate=False,
        score=score,
        keep=keep,
    )


def test_empty_input() -> None:
    assert beam_merge([]) == []


def test_no_kept_blocks() -> None:
    assert beam_merge([_blk(0, -5.0, keep=False)]) == []


def test_all_adjacent_kept_blocks_taken() -> None:
    blocks = [_blk(i, 20.0) for i in range(5)]
    assert [b.block_id for b in beam_merge(blocks)] == [0, 1, 2, 3, 4]


def test_single_gap_is_free() -> None:
    # one dropped block between kept ones costs nothing (templates
    # interleave separators); both sides are taken
    blocks = [_blk(0, 20.0), _blk(1, -5.0, keep=False), _blk(2, 20.0)]
    assert [b.block_id for b in beam_merge(blocks)] == [0, 2]


def test_distant_weak_fragment_pruned() -> None:
    # a tiny kept fragment stranded far behind many dropped blocks is not
    # worth the gap penalty
    blocks = [_blk(0, 50.0)]
    blocks += [_blk(i, -10.0, keep=False) for i in range(1, 8)]
    blocks.append(_blk(8, 3.0))  # gap=7 -> penalty 5*(7-1)=30 > 3
    assert [b.block_id for b in beam_merge(blocks)] == [0]


def test_distant_strong_block_still_taken() -> None:
    blocks = [_blk(0, 50.0)]
    blocks += [_blk(i, -10.0, keep=False) for i in range(1, 8)]
    blocks.append(_blk(8, 100.0))  # 100 - 30 >> 0
    assert [b.block_id for b in beam_merge(blocks)] == [0, 8]


def test_deterministic_on_ties() -> None:
    # two identical-score options: earlier ids must win, repeatably
    blocks = [_blk(0, 10.0), _blk(1, 10.0)]
    for _ in range(5):
        assert [b.block_id for b in beam_merge(blocks)] == [0, 1]


def test_result_in_document_order() -> None:
    blocks = [_blk(2, 20.0), _blk(0, 20.0), _blk(1, 20.0)]
    # input order scrambled; output follows kept-list order of input ids
    out = beam_merge(sorted(blocks, key=lambda b: b.block_id))
    assert [b.block_id for b in out] == [0, 1, 2]


def test_fast_path_equals_full_beam_on_random_configs() -> None:
    # property: the adjacency fast path must return exactly what the full
    # beam returns — checked by forcing the slow path via a sentinel
    import random

    from manga_ocr_spark.extraction import merge as M

    rng = random.Random(1234)
    for trial in range(300):
        n = rng.randint(1, 12)
        blocks = []
        for i in range(n):
            keep = rng.random() < 0.6
            score = rng.uniform(3, 60) if keep else -rng.uniform(3, 60)
            blocks.append(_blk(i, score, keep=keep))
        got = M.beam_merge(blocks)
        # reference algorithm: brute-force best subsequence for small n
        kept = [b for b in blocks if b.keep]
        best, best_ids = 0.0, ()
        for mask in range(1 << len(kept)):
            ids, total, last = [], 0.0, -1
            for j, b in enumerate(kept):
                if mask >> j & 1:
                    add = b.score if last < 0 else b.score - M.GAP_PENALTY * max(
                        0, b.block_id - last - 2
                    )
                    total += add
                    ids.append(b.block_id)
                    last = b.block_id
            if total > best or (total == best and tuple(ids) < best_ids and ids):
                best, best_ids = total, tuple(ids)
        got_ids = tuple(b.block_id for b in got)
        assert got_ids == best_ids, (trial, got_ids, best_ids, [(b.block_id, b.keep, round(b.score,1)) for b in blocks])
