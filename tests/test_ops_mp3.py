"""MPEG-1 Layer III bitstream codec: exact spectrum round-trips across
bit-reservoir layouts, requantization math, IMDCT parity with the naive
spec formula, Huffman-table tripwires, and the synthesis plug-point."""

import numpy as np
import pytest

from raykg.ops import mp3


def _specs(n_granules, n=120, seed=0):
    return [((np.arange(n) * 5 + 7 * g + seed) % 3) - 1 for g in range(n_granules)]


def test_spectrum_round_trip_all_reservoir_layouts():
    specs = _specs(6)
    for shift in (0, 1, 9, 40, 100):
        payload = mp3.encode_mp3(specs, bitrate_kbps=64, reservoir_shift=shift)
        grs = mp3.decode_mp3_granules(payload)
        assert len(grs) == 6
        for g, s in enumerate(specs):
            want = np.zeros(576, dtype=np.int64)
            want[: len(s)] = s
            assert (grs[g]["is"] == want).all(), (shift, g)


def test_reservoir_overflow_raises_loudly():
    import pytest

    with pytest.raises(ValueError, match="reservoir room"):
        mp3.encode_mp3(_specs(4), bitrate_kbps=64, reservoir_shift=180)


def test_requantization_gain():
    # global_gain 214 -> 2^((214-210)/4) = 2.0; |±1|^(4/3) = 1
    specs = _specs(2, n=32)
    payload = mp3.encode_mp3(specs, global_gain=214)
    grs = mp3.decode_mp3_granules(payload)
    for g, s in enumerate(specs):
        want = np.zeros(576)
        want[: len(s)] = s * 2.0
        assert np.allclose(grs[g]["xr"], want)


def test_frame_header_fields():
    payload = mp3.encode_mp3(_specs(2), bitrate_kbps=96)
    (fr,) = mp3.parse_mp3_frames(payload)
    assert fr.sample_rate == 44100 and fr.bitrate == 96
    assert len(fr.granules) == 2
    assert fr.granules[0].global_gain == 210
    # frame length = 144 * bitrate / rate
    assert len(payload) == 144 * 96000 // 44100


def test_id3v2_tag_skipped():
    body = mp3.encode_mp3(_specs(2))
    tag = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 10]) + b"\x00" * 10
    frames = mp3.parse_mp3_frames(tag + body)
    assert len(frames) == 1


def test_imdct_matches_naive_spec_formula():
    rng = np.random.default_rng(61)
    X = rng.normal(size=(32, 18))
    got = mp3.imdct_long(X)
    n = 36
    for sb in (0, 7, 31):
        for i in (0, 1, 17, 35):
            naive = sum(
                X[sb, k] * np.cos(np.pi / (2 * n) * (2 * i + 1 + n / 2) * (2 * k + 1))
                for k in range(18)
            ) * np.sin(np.pi / n * (i + 0.5))
            assert abs(got[sb, i] - naive) < 1e-12


def test_huffman_tables_kraft_tripwire():
    # a mis-transcribed (incomplete or clashing) table cannot load
    with pytest.raises(AssertionError, match="kraft"):
        mp3._build_pairs([(0, 0, 1, 1), (0, 1, 3, 1), (1, 0, 2, 1)])
    with pytest.raises(AssertionError, match="prefix"):
        mp3._build_pairs(
            [(0, 0, 1, 1), (0, 1, 2, 3), (1, 0, 2, 1), (1, 1, 2, 0)]
        )


def test_synthesis_is_the_documented_plug_point():
    with pytest.raises(NotImplementedError, match="3-B.3"):
        mp3.synthesize(np.zeros((18, 32)))
    d = np.zeros(512)
    d[0] = 1.0
    assert mp3.synthesize(np.zeros((18, 32)), d_table=d).shape == (576,)


def test_unknown_huffman_table_raises_clearly():
    # hand-flip the table_select field to an untranscribed table id
    payload = bytearray(mp3.encode_mp3(_specs(2)))
    # side info mono: table_select of granule 0 region 0 begins at bit
    # 4*8 + 9+5+4 + 12+9+8+4+1 = 32+18+34 = 84
    bitpos = 84
    payload[bitpos // 8] |= 0x80 >> (bitpos % 8)  # table 1 -> 17
    with pytest.raises(NotImplementedError, match="not transcribed"):
        mp3.decode_mp3_granules(bytes(payload))


def test_stereo_lr_round_trip_with_reservoir():
    """Two-channel LR stereo: 32-byte side info, per-granule channel
    interleave, per-channel IMDCT overlap state — exact spectra for both
    channels across reservoir layouts."""
    L = [((np.arange(90) * 5 + 7 * g) % 3) - 1 for g in range(4)]
    R = [((np.arange(90) * 11 + 3 * g) % 3) - 1 for g in range(4)]
    for shift in (0, 17):
        payload = mp3.encode_mp3(
            L, bitrate_kbps=96, right_spectra=R, reservoir_shift=shift
        )
        (f0, _f1) = mp3.parse_mp3_frames(payload)
        assert f0.nch == 2 and len(f0.granules) == 4
        grs = mp3.decode_mp3_granules(payload)
        assert len(grs) == 8
        for g in range(4):
            for ch, src in ((0, L), (1, R)):
                got = grs[2 * g + ch]
                assert got["channel"] == ch
                want = np.zeros(576, dtype=np.int64)
                want[:90] = src[g]
                assert (got["is"] == want).all(), (shift, g, ch)


def test_ms_joint_stereo_reconstructs_lr():
    """MS-coded frames: channels carry mid/side integers; requantized
    output is L/R = (M±S)/sqrt2, while the raw quantized spectra stay
    the coded mid/side values."""
    M = [((np.arange(80) * 5 + 7 * g) % 3) - 1 for g in range(2)]
    S = [((np.arange(80) * 11 + 3 * g) % 3) - 1 for g in range(2)]
    payload = mp3.encode_mp3(M, right_spectra=S, joint_ms=True)
    fr = mp3.parse_mp3_frames(payload)[0]
    assert fr.mode == 0b01 and fr.mode_ext == 0b10
    grs = mp3.decode_mp3_granules(payload)
    inv = 1 / np.sqrt(2)
    for g in range(2):
        m = np.zeros(576)
        m[:80] = M[g]
        s = np.zeros(576)
        s[:80] = S[g]
        assert np.allclose(grs[2 * g]["xr"], (m + s) * inv)
        assert np.allclose(grs[2 * g + 1]["xr"], (m - s) * inv)
        assert (grs[2 * g]["is"][:80] == M[g]).all()
        assert (grs[2 * g + 1]["is"][:80] == S[g]).all()


def test_all_block_types_round_trip():
    """Normal, start, stop, and SHORT granules: spectrum recovery is
    exact through side-info layout, Huffman, and reservoir for every
    window type."""
    specs = [((np.arange(150) * 5 + 7 * g) % 3) - 1 for g in range(4)]
    for bt in (0, 1, 2, 3):
        payload = mp3.encode_mp3(
            specs, bitrate_kbps=64, block_type=bt, reservoir_shift=11
        )
        grs = mp3.decode_mp3_granules(payload)
        for g in range(4):
            want = np.zeros(576, dtype=np.int64)
            want[:150] = specs[g]
            assert (grs[g]["is"] == want).all(), (bt, g)
        fr = mp3.parse_mp3_frames(payload)[0]
        assert fr.granules[0].window_switching == (1 if bt else 0)
        assert fr.granules[0].block_type == (bt if bt else 0)


def test_short_block_reorder_lands_in_right_subband():
    # stored pos 56 = band 4 (start 16, width 6), window 1, line 2
    # -> per-window line 18 -> subband 3
    spec = np.zeros(576, dtype=np.int64)
    spec[56] = 1
    g0 = mp3.decode_mp3_granules(mp3.encode_mp3([spec, spec], block_type=2))[0]
    sub = g0["subbands"]
    nz = np.flatnonzero(np.abs(sub).sum(axis=0) > 1e-12)
    assert nz.tolist() == [3]


def test_imdct_short_matches_naive_formula():
    rng = np.random.default_rng(71)
    X = rng.normal(size=(2, 18))  # 2 subbands, 3 windows x 6 lines
    got = mp3.imdct_short(X)
    for sb in range(2):
        naive = np.zeros(36)
        for w in range(3):
            for i in range(12):
                v = sum(
                    X[sb, w * 6 + k]
                    * np.cos(np.pi / 24 * (2 * i + 1 + 6) * (2 * k + 1))
                    for k in range(6)
                ) * np.sin(np.pi / 12 * (i + 0.5))
                naive[6 + 6 * w + i] += v
        assert np.allclose(got[sb], naive, atol=1e-12)


def test_start_stop_windows_match_spec_shapes():
    # start window: sine ramp 0-17, flat 18-23, short ramp 24-29, zero tail
    w1 = mp3._LONG_WINDOWS[1]
    assert np.allclose(w1[:18], np.sin(np.pi / 36 * (np.arange(18) + 0.5)))
    assert (w1[18:24] == 1.0).all()
    assert np.allclose(
        w1[24:30], np.sin(np.pi / 12 * (np.arange(24, 30) + 0.5 - 18))
    )
    assert (w1[30:] == 0.0).all()
    # stop window is the time-reversed start window
    assert np.allclose(mp3._LONG_WINDOWS[3], w1[::-1])


def test_mixed_block_round_trip_and_geometry():
    """mixed_block_flag granules: lines 0-35 long-coded (long
    scalefactor bands, alias reduction at the single long boundary,
    long IMDCT), short section starting at short band 3 / subband 2."""
    specs = [((np.arange(200) * 5 + 7 * g) % 3) - 1 for g in range(4)]
    payload = mp3.encode_mp3(specs, block_type=2, mixed=True, reservoir_shift=7)
    fr = mp3.parse_mp3_frames(payload)[0]
    assert fr.granules[0].mixed_block == 1
    grs = mp3.decode_mp3_granules(payload)
    for g in range(4):
        want = np.zeros(576, dtype=np.int64)
        want[:200] = specs[g]
        assert (grs[g]["is"] == want).all(), g
    # long-section line 20 -> subband 1 (alias leak into 0 allowed);
    # short stored pos 36 = short band 3 w0 l0 -> subband 2
    for planted, want_sb in ((20, 1), (36, 2)):
        s = np.zeros(576, dtype=np.int64)
        s[planted] = 1
        g0 = mp3.decode_mp3_granules(
            mp3.encode_mp3([s, s], block_type=2, mixed=True)
        )[0]
        nz = np.flatnonzero(np.abs(g0["subbands"]).sum(axis=0) > 1e-12)
        assert want_sb in nz.tolist()
    import pytest

    with pytest.raises(ValueError, match="block_type=2"):
        mp3.encode_mp3(specs, block_type=1, mixed=True)


def test_scalefactors_scfsi_preflag_round_trip():
    """Nonzero scalefactors (scalefac_scale=1 -> exact powers of two),
    scfsi group sharing (granule 1 copies granule 0's groups and reads
    no bits), and preflag/pretab all requantize exactly."""
    rng = np.random.default_rng(9)
    specs = [((np.arange(120) * 5 + 7 * g) % 3) - 1 for g in range(4)]
    sfs = [rng.integers(0, 4, 21) for _ in range(4)]
    payload = mp3.encode_mp3(
        specs, scalefactors=sfs, scalefac_compress=9,
        scalefac_scale=1, reservoir_shift=5,
    )
    grs = mp3.decode_mp3_granules(payload)
    sfb = np.array(mp3.SFB_LONG[44100])
    band_of = np.searchsorted(sfb[1:], np.arange(576), side="right")
    for g in range(4):
        want = np.zeros(576)
        want[:120] = specs[g]
        want *= 2.0 ** (-sfs[g][np.minimum(band_of, 20)].astype(float))
        assert np.allclose(grs[g]["xr"], want), g

    sfs2 = [rng.integers(0, 4, 21) for _ in range(2)]
    payload = mp3.encode_mp3(
        specs[:2], scalefactors=sfs2, scalefac_compress=9,
        scalefac_scale=1, scfsi=(1, 0, 1, 0),
    )
    grs = mp3.decode_mp3_granules(payload)
    eff1 = sfs2[1].copy()
    eff1[0:6] = sfs2[0][0:6]
    eff1[11:16] = sfs2[0][11:16]
    for g, eff in ((0, sfs2[0]), (1, eff1)):
        want = np.zeros(576)
        want[:120] = specs[g]
        want *= 2.0 ** (-eff[np.minimum(band_of, 20)].astype(float))
        assert np.allclose(grs[g]["xr"], want), g

    payload = mp3.encode_mp3(
        specs[:2], scalefactors=[np.zeros(21, int)] * 2,
        scalefac_scale=1, preflag=1,
    )
    grs = mp3.decode_mp3_granules(payload)
    pre = mp3.PRETAB[np.minimum(band_of, 21)]
    want = np.zeros(576)
    want[:120] = specs[0]
    want *= 2.0 ** (-pre.astype(float))
    assert np.allclose(grs[0]["xr"], want)


def test_scalefactor_guards():
    specs = [np.zeros(4, dtype=np.int64)] * 2
    with pytest.raises(ValueError, match="slen"):
        mp3.encode_mp3(specs, scalefactors=[np.full(21, 9)] * 2,
                       scalefac_compress=9)
    with pytest.raises(ValueError, match="scfsi needs scalefactors"):
        mp3.encode_mp3(specs, scfsi=(1, 0, 0, 0))
    with pytest.raises(ValueError, match="long blocks only"):
        mp3.encode_mp3(specs, scalefactors=[np.zeros(21, int)] * 2,
                       block_type=2)
    with pytest.raises(ValueError, match="scalefactors_right"):
        mp3.encode_mp3(specs, right_spectra=specs,
                       scalefactors=[np.zeros(21, int)] * 2)


def test_intensity_stereo_reconstructs_positions():
    """Intensity-coded bands (right channel zero region) steer the left
    channel's energy by position: L = m*ratio/(1+ratio),
    R = m/(1+ratio), ratio = tan(pos*pi/12); pos 6 -> (1, 0); pos 7 ->
    band not intensity-coded.  Bands still holding right-channel data
    are untouched."""
    sfb = np.array(mp3.SFB_LONG[44100])
    L = [((np.arange(100) * 5 + 7 * g) % 3) - 1 for g in range(2)]
    R = []
    for g in range(2):
        r = np.zeros(100, dtype=np.int64)
        r[:30] = ((np.arange(30) * 11 + 3 * g) % 3) - 1  # rzero = 30
        R.append(r)
    pos = np.zeros(21, dtype=np.int64)  # below band 7: plain scalefac 0
    for b in range(7, 21):              # intensity region (starts >= 30)
        pos[b] = b % 8                  # includes pos 7 (fallback bands)
    sfs0 = [np.zeros(21, dtype=np.int64)] * 2
    payload = mp3.encode_mp3(
        L, right_spectra=R, joint_intensity=True,
        scalefactors=sfs0, scalefactors_right=[pos] * 2,
        scalefac_compress=13,
    )
    fr = mp3.parse_mp3_frames(payload)[0]
    assert fr.mode == 0b01 and fr.mode_ext == 0b01
    grs = mp3.decode_mp3_granules(payload)
    for g in range(2):
        wl = np.zeros(576)
        wl[:100] = L[g]
        wr = np.zeros(576)
        wr[:100] = R[g]
        exp_l, exp_r = wl.copy(), wr.copy()
        for b in range(7, 21):
            p = b % 8
            if p == 7:
                continue  # falls back to LR (no MS here)
            lo, hi = sfb[b], sfb[b + 1]
            if p == 6:
                kl, kr = 1.0, 0.0
            else:
                ratio = np.tan(p * np.pi / 12)
                kl, kr = ratio / (1 + ratio), 1 / (1 + ratio)
            exp_r[lo:hi] = wl[lo:hi] * kr
            exp_l[lo:hi] = wl[lo:hi] * kl
        assert np.allclose(grs[2 * g]["xr"], exp_l), g
        assert np.allclose(grs[2 * g + 1]["xr"], exp_r), g


def test_intensity_on_short_blocks_raises():
    specs = [np.zeros(8, dtype=np.int64)] * 2
    payload = bytearray(
        mp3.encode_mp3(specs, right_spectra=specs, block_type=2)
    )
    # flip mode to joint + intensity
    payload[3] = (payload[3] & 0x0F) | 0b0101 << 4
    with pytest.raises(NotImplementedError, match="short"):
        mp3.decode_mp3_granules(bytes(payload))
