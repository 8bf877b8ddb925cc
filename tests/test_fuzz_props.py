"""Property-based fuzz tests (hypothesis) for the pure-python kernels:
codec round-trips over arbitrary payload shapes, MP3 spectrum recovery
over arbitrary quantized spectra/layouts, MP4 chunk walks, tokenizer
character conservation, and normalization idempotence.  No Ray — these
pin the kernels the distributed stages call per batch."""

import numpy as np
from hypothesis import given, settings, strategies as st

from raykg.ops import codecs, mp3, mp4

SETTINGS = dict(max_examples=30, deadline=None)


@settings(**SETTINGS)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    ft=st.integers(0, 4),
    interlace=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_round_trip_any_shape(h, w, ft, interlace, seed):
    img = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    out = codecs.decode_png(codecs.encode_png(img, filter_type=ft, interlace=interlace))
    assert (out == img).all()


@settings(**SETTINGS)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    ncolors=st.integers(2, 64),
    interlace=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_gif_round_trip_any_shape(h, w, ncolors, interlace, seed):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (ncolors, 3), dtype=np.uint8)
    img = pal[rng.integers(0, ncolors, (h, w))]
    out = codecs.decode_gif_frames(codecs.encode_gif([img], interlace=interlace))
    assert (out[0] == img).all()


@settings(**SETTINGS)
@given(
    n=st.integers(1, 5000),
    spc=st.integers(1, 999),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_mp4_pcm_round_trip_any_chunking(n, spc, rate, seed):
    s = np.random.default_rng(seed).integers(-32768, 32767, n).astype(np.int16)
    got_rate, out = mp4.decode_mp4_audio(
        mp4.encode_mp4_audio(s, rate, samples_per_chunk=spc)
    )
    assert got_rate == rate and (out == s).all()


@settings(**SETTINGS)
@given(
    n_gr=st.integers(1, 6),
    n=st.integers(0, 576),
    shift=st.integers(0, 60),
    bt=st.sampled_from([0, 1, 2, 3]),
    seed=st.integers(0, 2**31 - 1),
)
def test_mp3_spectrum_recovery_any_layout(n_gr, n, shift, bt, seed):
    rng = np.random.default_rng(seed)
    specs = [rng.integers(-1, 2, n).astype(np.int64) for _ in range(n_gr)]
    payload = mp3.encode_mp3(
        specs, bitrate_kbps=128, reservoir_shift=shift, block_type=bt
    )
    grs = mp3.decode_mp3_granules(payload)
    for g, s in enumerate(specs):
        want = np.zeros(576, dtype=np.int64)
        want[: len(s)] = s
        assert (grs[g]["is"] == want).all()
    # padding granule of an odd count decodes to silence
    if n_gr % 2:
        assert (grs[n_gr]["is"] == 0).all()


@settings(**SETTINGS)
@given(
    n=st.integers(0, 400),
    shift=st.integers(0, 40),
    seed=st.integers(0, 2**31 - 1),
)
def test_mp3_stereo_spectrum_recovery(n, shift, seed):
    rng = np.random.default_rng(seed)
    L = [rng.integers(-1, 2, n).astype(np.int64) for _ in range(2)]
    R = [rng.integers(-1, 2, n).astype(np.int64) for _ in range(2)]
    grs = mp3.decode_mp3_granules(
        mp3.encode_mp3(L, bitrate_kbps=256, right_spectra=R,
                       reservoir_shift=shift)
    )
    for g in range(2):
        for ch, src in ((0, L), (1, R)):
            want = np.zeros(576, dtype=np.int64)
            want[:n] = src[g]
            assert (grs[2 * g + ch]["is"] == want).all()


@settings(**SETTINGS)
@given(text=st.text(max_size=200), lang=st.sampled_from(["en", "fr", "de", "ja", "zh", "ru", "tr", "fi"]))
def test_tokenizer_conserves_non_space_characters(text, lang):
    """No tokenizer may drop or duplicate non-whitespace characters —
    the reconstruction invariant the reference's tokenizer guarantees."""
    from raykg.core.tokenize import Tokenizer

    toks = Tokenizer(lang).tokenize(text)
    got = "".join("".join(t[0].split()) for t in toks)
    want = "".join(text.split())
    assert got == want
    # and every token's (start, end) span matches its text
    for t, s0, s1 in toks:
        assert text[s0:s1] == t


@settings(**SETTINGS)
@given(text=st.text(max_size=120))
def test_normalization_idempotent(text):
    from raykg.core.normalize import normalize

    once = normalize(text, ignore_case=True, ignore_diacritics=True)
    twice = normalize(once, ignore_case=True, ignore_diacritics=True)
    assert once == twice


@settings(**SETTINGS)
@given(
    n=st.integers(0, 400),
    vmax=st.integers(1, 50),
    w=st.integers(1, 12),
    seed=st.integers(0, 2**31 - 1),
)
def test_winnow_select_matches_bruteforce(n, vmax, w, seed):
    """_select == the literal definition: rightmost argmin of every
    sliding window of min(w, n) hashes, deduped."""
    from raykg.ops.winnow import _select

    h = np.random.default_rng(seed).integers(0, vmax, n).astype(np.int64)
    got = _select(h, w).tolist()
    if n == 0:
        assert got == []
        return
    weff = min(w, n)
    want = set()
    for start in range(n - weff + 1):
        win = h[start : start + weff]
        m = win.min()
        want.add(start + int(np.flatnonzero(win == m)[-1]))
    assert got == sorted(want)


@settings(**SETTINGS)
@given(
    nwords=st.integers(0, 200),
    vocab=st.integers(1, 30),
    divisor=st.integers(1, 16),
    seed=st.integers(0, 2**31 - 1),
)
def test_cdc_boundary_chunking_invariants(nwords, vocab, divisor, seed):
    """Chunks tile the word sequence exactly; every chunk ends on a
    boundary word except possibly the last; concatenating chunk texts
    reconstructs the document."""
    from raykg.ops.cdc import _word_is_boundary

    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in rng.integers(0, vocab, nwords)]
    bnd = _word_is_boundary(words, divisor)
    assert bnd.shape == (nwords,)
    ends = np.flatnonzero(bnd) + 1
    if not len(ends) or (nwords and ends[-1] != nwords):
        ends = np.r_[ends, nwords] if nwords else ends
    starts = np.r_[0, ends[:-1]] if len(ends) else np.zeros(0, dtype=int)
    rebuilt = []
    for s, e in zip(starts, ends):
        assert e > s
        if e < nwords:
            assert bnd[e - 1]
        assert not bnd[s : e - 1].any()
        rebuilt += words[s:e]
    assert rebuilt == words


@settings(**SETTINGS)
@given(
    nwords=st.integers(0, 120),
    vocab=st.integers(1, 20),
    n=st.integers(1, 8),
    seed=st.integers(0, 2**31 - 1),
)
def test_novelty_gram_hashes_props(nwords, vocab, n, seed):
    """Distinct-gram hashes: sorted unique, count bounded by both the
    gram count and vocabulary^n, empty only for empty input."""
    from raykg.ops.novelty import _distinct_gram_hashes

    rng = np.random.default_rng(seed)
    text = " ".join(f"w{i}" for i in rng.integers(0, vocab, nwords))
    h = _distinct_gram_hashes(text, n)
    if nwords == 0:
        assert h.size == 0
        return
    assert h.size >= 1
    assert (np.diff(h) > 0).all()  # sorted strictly increasing (unique)
    assert h.size <= max(nwords - n + 1, 1)
    assert (h >= 0).all()  # 63-bit non-negative
