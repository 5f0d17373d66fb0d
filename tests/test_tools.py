"""Research tools: optimal backward references + histogram drawing
(role parity: research/find_opt_references.cc, draw_histogram.cc,
draw_diff.cc)."""

import numpy as np
import pytest


def test_suffix_array_and_lpf():
    from brotli_tpu.tools import optref
    rng = np.random.default_rng(0)
    for trial in range(12):
        n = int(rng.integers(2, 300))
        data = rng.integers(0, 4, n).astype(np.uint8)
        sa = optref.suffix_array(data)
        # oracle: sorted suffixes
        suf = sorted(range(n), key=lambda i: data[i:].tobytes())
        assert np.array_equal(sa, suf), trial
        ln, src = optref.longest_previous_factor(data)
        b = data.tobytes()
        for i in range(n):
            # oracle LPF: longest prefix of data[i:] at an earlier pos
            best = 0
            for j in range(i):
                k = 0
                while i + k < n and data[j + k] == data[i + k]:
                    k += 1
                best = max(best, k)
            assert ln[i] == best, (trial, i)
            if best:
                s = int(src[i])
                assert 0 <= s < i
                assert b[s:s + best] == b[i:i + best]


def test_find_references_and_histogram(tmp_path, testdata):
    from brotli_tpu.tools import optref, draw_histogram, draw_diff
    data = np.frombuffer(
        (testdata / "alice29.txt").read_bytes()[:20000], np.uint8)
    pos, dist, ln = optref.find_references(data, min_length=4)
    assert len(pos) > 1000
    assert np.all(dist > 0) and np.all(ln >= 4)
    rec = tmp_path / "refs.txt"
    with open(rec, "w") as f:
        for p, d, l2 in zip(pos, dist, ln):
            f.write(f"{p} {d} {l2}\n")
    img_path = tmp_path / "h.pgm"
    draw_histogram.main([str(rec), str(img_path),
                         "--width", "200", "--height", "100"])
    img = draw_histogram.read_pgm(str(img_path))
    assert img.shape == (100, 200)
    assert (img < 255).any()  # something was drawn
    # diff with itself = no unique pixels
    out = tmp_path / "d.pgm"
    draw_diff.main([str(img_path), str(img_path), str(out)])
    d = draw_histogram.read_pgm(str(out))
    assert set(np.unique(d)) <= {0, 255}


def test_fuzz_corpus_replay():
    """The persisted fuzz corpus (tests/fuzz_corpus, accumulated by
    tools/fuzz.py runs -- the fuzz_data.zip replay role) must pass the
    full differential: python vs native vs chunked-feeding decode."""
    from brotli_tpu.tools import fuzz

    stats = fuzz.replay(fuzz.DEFAULT_SAVE)
    assert stats["files"] >= 50, stats
    assert stats["accept"] + stats["reject"] == stats["files"]


def test_fuzz_short_fresh_run(tmp_path):
    """A short fresh differential fuzz run with corpus persistence to
    a scratch dir (exercises signature dedup + save paths)."""
    from brotli_tpu.tools import fuzz

    stats = fuzz.run(iters=150, seed=99, corpus=None, save=tmp_path)
    assert stats["accept"] + stats["reject"] == 150
    assert stats["new"] == len(list(tmp_path.glob("*.bin")))
