"""Speech channel coding tests: loopback, error correction, BFI."""

import numpy as np
import pytest

from tetra_tpu.voice import channel as vch

RNG = np.random.default_rng(21)


def test_reorder_roundtrip():
    frames = RNG.integers(0, 2, 2 * 137).astype(np.uint8)
    seq = vch.reorder_from_codec(frames)
    back = vch.reorder_to_codec(seq)
    assert (back == frames).all()


def test_interleave_roundtrip():
    bits = RNG.integers(0, 2, 432).astype(np.uint8)
    il = vch.interleave(bits)
    assert not (il == bits).all()
    deperm = vch._perm_pair(vch._IL_LINES, vch._IL_COLUMNS, False)[1]
    assert (il[deperm] == bits).all()


def test_codec_profile_calibration_converges():
    """VERDICT r2 item 5: feed a TX stream built under an ALTERNATE
    convention (different CRC-8 generator + transposed 5.5.3 matrix); the
    receiver's ProfileCalibrator must converge on it from repeated CRC
    failure alone, with zero code change, after which slots decode clean
    and bit-exact."""
    from tetra_tpu.rx.tdma import TdmaTime
    from tetra_tpu.voice.pipeline import VoicePipeline

    alt = vch.CodecProfile(crc8_poly=0x07, il_transposed=True, name="alt-tx")
    default = vch.get_profile()
    assert (alt.crc8_poly != default.crc8_poly
            and alt.il_transposed != default.il_transposed)
    frames = RNG.integers(0, 2, (14, 2, 137)).astype(np.uint8)
    slots = [vch.encode_slot(f.reshape(-1), profile=alt) for f in frames]
    msgs = []
    try:
        vp = VoicePipeline(calibrate=True)
        vp.calibrator.log = msgs.append
        for i, slot in enumerate(slots):
            t = TdmaTime(mn=3, fn=(i % 18) + 1, tn=2, sn=1)
            vp(t, slot)
        resolved = vp.calibrator.resolved
        assert resolved is not None, "calibration never fired"
        assert resolved.crc8_poly == alt.crc8_poly
        assert resolved.il_transposed == alt.il_transposed
        assert msgs and "resolved" in msgs[0]
        # resolution lands in THE PIPELINE's profile; the process global is
        # untouched (ADVICE r3: concurrent per-channel calibrators must not
        # flip the convention for every channel)
        assert vp.profile is resolved
        assert vch.get_profile() is default
        assert vp.calibration_status()["full"] == "resolved"
        # post-resolution slots decode clean and bit-exact under it
        dec, bfi = vch.decode_slot(np.stack(slots[-3:]), profile=vp.profile)
        assert not bfi.any()
        assert (dec == frames[-3:]).all()
        # the first decodes failed under the default profile, later ones
        # succeed: bad_frames < slots_decoded
        assert vp.slots_decoded == len(slots)
        assert 0 < vp.bad_frames < len(slots)
    finally:
        vch.set_profile(default)


def test_codec_profile_load(tmp_path):
    import json
    default = vch.get_profile()
    p = tmp_path / "profile.json"
    p.write_text(json.dumps(dict(crc8_poly="0x31", crc4_poly=9,
                                 il_transposed=True, name="etsi-real")))
    try:
        prof = vch.load_profile(str(p))
        assert (prof.crc8_poly, prof.crc4_poly, prof.il_transposed) == (
            0x31, 9, True)
        assert vch.get_profile() is prof
        # loopback under the loaded profile is self-consistent
        frames = RNG.integers(0, 2, (2, 2, 137)).astype(np.uint8)
        slots = np.stack([vch.encode_slot(f.reshape(-1)) for f in frames])
        dec, bfi = vch.decode_slot(slots)
        assert not bfi.any() and (dec == frames).all()
    finally:
        vch.set_profile(default)


def test_slot_loopback_clean():
    frames = RNG.integers(0, 2, (3, 2, 137)).astype(np.uint8)
    slots = np.stack([vch.encode_slot(f.reshape(-1)) for f in frames])
    dec, bfi = vch.decode_slot(slots)
    assert (dec == frames).all()
    assert not bfi.any()


def test_slot_corrects_errors():
    frames = RNG.integers(0, 2, (1, 2, 137)).astype(np.uint8)
    slot = vch.encode_slot(frames[0].reshape(-1))
    bad = slot.copy()
    # flip bits inside the protected (coded) region only; class-0 bits are
    # unprotected by design.  positions of coded bits after interleaving:
    perm = vch._perm_pair(vch._IL_LINES, vch._IL_COLUMNS, False)[0]
    coded_positions = np.nonzero(perm >= vch.N_C0)[0]
    for pos in RNG.choice(coded_positions, 6, replace=False):
        bad[pos] ^= 1
    dec, bfi = vch.decode_slot(bad[None])
    # protected classes must be restored
    seq_want = vch.reorder_from_codec(frames[0].reshape(-1))
    seq_got = vch.reorder_from_codec(dec[0].reshape(-1))
    assert (seq_got[vch.N_C0:] == seq_want[vch.N_C0:]).all()
    assert not bfi[0]


def test_bfi_on_heavy_corruption():
    frames = RNG.integers(0, 2, (1, 2, 137)).astype(np.uint8)
    slot = vch.encode_slot(frames[0].reshape(-1))
    trash = RNG.integers(0, 2, 432).astype(np.uint8)
    _, bfi = vch.decode_slot(trash[None])
    assert bfi[0]


def test_acelp_synthesizer_basic():
    from tetra_tpu.voice.acelp import AcelpDecoder
    dec = AcelpDecoder()
    rng = np.random.default_rng(11)   # own stream: module RNG state varies
    audio = np.concatenate([
        dec.decode_frame(rng.integers(0, 2, 137).astype(np.uint8))
        for _ in range(50)])
    x = audio.astype(float)
    assert audio.shape == (50 * 240,)
    assert np.isfinite(x).all()
    rms = np.sqrt(np.mean(x ** 2))
    assert 100 < rms < 30000          # bounded, non-silent
    # pure-garbage frames legitimately hit max gains sometimes; the runaway
    # guard must keep clipping occasional, not saturated
    assert np.mean(np.abs(x) >= 32767) < 0.2  # not stuck at the rails


def _neutral_lsf_bits(f):
    """Write mid-scale LSF indices (near-zero prediction deltas) so crafted
    test frames keep a neutral spectral envelope."""
    bits = [3, 3, 2, 3, 3, 3, 2, 2, 2, 3]   # = split-VQ groups 8|9|9
    off = 0
    for nb in bits:
        # below-center index: slight downward delta, keeping the upper LSFs
        # away from pi (an upward bias parks a resonance at Nyquist)
        mid = (1 << nb) // 2 - 1
        f[off:off + nb] = [int(b) for b in np.binary_repr(mid, nb)]
        off += nb


def _field(name):
    from tetra_tpu.voice.acelp import frame_field
    return frame_field(name)


def _gain_off(s4):
    return _field(f"gain{s4 + 1}")[0]


def _code_off(s4):
    return _field(f"code{s4 + 1}")[0]


def _pitch_off(s4):
    return _field(f"pitch{s4 + 1}")[0]


def test_acelp_pitch_tracking():
    """Seed the excitation with code pulses, then sustain with pitch-only
    frames at lag 20: the adaptive codebook must carry a 20-sample period."""
    from tetra_tpu.voice.acelp import AcelpDecoder
    dec = AcelpDecoder()

    seed = np.zeros(137, np.uint8)
    _neutral_lsf_bits(seed)
    for s4 in range(4):
        g = _gain_off(s4)
        seed[g + 3:g + 6] = [1, 1, 1]          # code gain max, pitch gain 0

    sustain = np.zeros(137, np.uint8)
    _neutral_lsf_bits(sustain)
    for s4 in range(4):
        g = _gain_off(s4)
        sustain[g:g + 3] = [1, 1, 1]           # pitch gain max, code gain min
    # lag 20 = index 0 absolute, deltas 0 (index 15)
    for s4 in range(3):
        o = _pitch_off(s4 + 1)
        sustain[o:o + 5] = [0, 1, 1, 1, 1]

    aud = [dec.decode_frame(seed) for _ in range(2)]
    aud += [dec.decode_frame(sustain) for _ in range(8)]
    x = np.concatenate(aud)[1200:].astype(float)
    x -= x.mean()
    assert np.abs(x).max() > 0
    ac = np.correlate(x, x, "full")[len(x) - 1:]
    peak_lag = np.argmax(ac[15:90]) + 15
    assert peak_lag % 20 == 0, peak_lag  # periodic at the commanded lag


def test_acelp_algebraic_full_subframe_coverage():
    """Pulses land across the whole 60-sample subframe (15-sample track
    blocks), not just its head: commanded at positions {14,29,44,59}, the
    synthesized excitation is periodic at ~15 samples."""
    from tetra_tpu.voice.acelp import AcelpDecoder
    dec = AcelpDecoder()
    f = np.zeros(137, np.uint8)
    _neutral_lsf_bits(f)
    for s4 in range(4):
        # algebraic: all 4 tracks posq=7 sign=+ -> field 0b1110 each
        a = _code_off(s4)
        f[a:a + 16] = [1, 1, 1, 0] * 4
        # gains: pitch gain 0, code gain max
        g = _gain_off(s4)
        f[g + 3:g + 6] = [1, 1, 1]
    aud = np.concatenate([dec.decode_frame(f) for _ in range(10)])
    x = aud[1200:].astype(float)
    x -= x.mean()
    ac = np.correlate(x, x, "full")[len(x) - 1:]
    peak_lag = np.argmax(ac[8:40]) + 8
    assert peak_lag % 15 == 0, peak_lag


def test_acelp_fractional_pitch():
    """Odd lag2 exercises the half-sample interpolator: commanded lag 40.5
    yields a waveform periodic at ~40.5 samples (autocorr peak at 40 or 41,
    clearly away from a hard 40-integer lock over many periods)."""
    from tetra_tpu.voice.acelp import AcelpDecoder
    dec = AcelpDecoder()
    f = np.zeros(137, np.uint8)
    _neutral_lsf_bits(f)
    # pitch0 idx = 41 -> lag2 = 81 -> 40.5 samples; deltas = +0 (idx 15)
    f[26:34] = [int(b) for b in np.binary_repr(41, 8)]  # pitch1 @26
    for s4 in range(3):
        o = _pitch_off(s4 + 1)
        f[o:o + 5] = [0, 1, 1, 1, 1]
    for s4 in range(4):
        g = _gain_off(s4)
        f[g:g + 3] = [1, 1, 1]       # max pitch gain
        f[g + 3:g + 6] = [1, 0, 0]   # mid code gain
    aud = np.concatenate([dec.decode_frame(f) for _ in range(12)])
    x = aud[1200:].astype(float)
    x -= x.mean()
    assert np.isfinite(x).all() and np.abs(x).max() > 0
    ac = np.correlate(x, x, "full")[len(x) - 1:]
    peak_lag = np.argmax(ac[25:60]) + 25
    assert peak_lag in (40, 41), peak_lag


def _vowel(dur_s=1.5, f0=110.0, amp=12000.0):
    """Synthetic voiced speech: pulse train with vibrato through 3 formants."""
    from scipy.signal import lfilter
    fs = 8000
    t = np.arange(int(fs * dur_s)) / fs
    inst = f0 * (1 + 0.02 * np.sin(2 * np.pi * 2.5 * t))
    phase = 2 * np.pi * np.cumsum(inst) / fs
    x = sum(np.cos(h * phase) / h for h in range(1, 30))
    for fc, bw in ((700, 110), (1200, 140), (2600, 250)):
        r = np.exp(-np.pi * bw / fs)
        th = 2 * np.pi * fc / fs
        x = lfilter([1.0], [1, -2 * r * np.cos(th), r * r], x)
    return (x / np.abs(x).max() * amp).astype(np.int16)


def test_acelp_encoder_roundtrip_quality():
    """Full codec loop on synthetic voiced speech: pitch preserved, energy
    tracked, LPC spectral envelope within 4 dB (CELP-class quality; waveform
    SNR is not the right metric at 4.6 kbit/s)."""
    from scipy.signal import freqz
    from tetra_tpu.voice.acelp import AcelpDecoder, AcelpEncoder
    pcm = _vowel()
    enc, dec = AcelpEncoder(), AcelpDecoder()
    nfr = len(pcm) // 240
    y = np.concatenate([
        dec.decode_frame(enc.encode_frame(pcm[i * 240:(i + 1) * 240]))
        for i in range(nfr)]).astype(float)
    xf = pcm[:nfr * 240].astype(float)

    # pitch: autocorrelation peak at the source period (8000/110 = 72.7)
    seg = y[4000:8000] - y[4000:8000].mean()
    ac = np.correlate(seg, seg, "full")[len(seg) - 1:]
    peak = np.argmax(ac[40:120]) + 40
    assert 71 <= peak <= 75, peak

    # energy: per-frame RMS within a factor of 2 after warmup
    for i in range(8, nfr):
        rx = np.sqrt(np.mean(xf[i * 240:(i + 1) * 240] ** 2))
        ry = np.sqrt(np.mean(y[i * 240:(i + 1) * 240] ** 2))
        assert 0.5 < ry / rx < 2.0, (i, rx, ry)

    # spectral envelope: order-10 LPC envelope SD (gain-removed) < 4 dB
    def env(sig, sl):
        s = sig[sl] * np.hamming(sl.stop - sl.start)
        r = np.correlate(s, s, "full")[len(s) - 1:len(s) + 11]
        R = np.array([[r[abs(i - j)] for j in range(10)] for i in range(10)])
        a = np.linalg.solve(R + np.eye(10) * r[0] * 1e-4, -r[1:11])
        w, H = freqz([1.0], np.r_[1, a], worN=256, fs=8000)
        return w, 20 * np.log10(np.abs(H) + 1e-9)

    sds = []
    for start in range(2400, len(y) - 480, 480):
        sl = slice(start, start + 480)
        w, ex = env(xf, sl)
        _, ey = env(y, sl)
        band = (w > 200) & (w < 3400)
        d = (ex - ey)[band]
        d -= d.mean()
        sds.append(np.sqrt(np.mean(d ** 2)))
    assert np.mean(sds) < 4.0, np.mean(sds)


def test_acelp_encoder_bitstream_wellformed():
    """Encoder output decodes deterministically and the pitch deltas stay
    inside the 5-bit field range frame over frame."""
    from tetra_tpu.voice.acelp import AcelpDecoder, AcelpEncoder
    pcm = _vowel(dur_s=0.6)
    enc = AcelpEncoder()
    frames = [enc.encode_frame(pcm[i * 240:(i + 1) * 240])
              for i in range(len(pcm) // 240)]
    for f in frames:
        assert f.shape == (137,) and set(np.unique(f)) <= {0, 1}
    d1, d2 = AcelpDecoder(), AcelpDecoder()
    for f in frames:
        assert (d1.decode_frame(f) == d2.decode_frame(f)).all()


def test_voice_codec_over_air_loopback():
    """Speech -> ACELP encode -> speech channel encode -> channel decode ->
    ACELP decode: the full over-air voice loop reproduces the signal class
    (pitch + bounded energy), with zero bad frames."""
    from tetra_tpu.voice.acelp import AcelpDecoder, AcelpEncoder
    pcm = _vowel(dur_s=0.96)           # 16 frames = 8 slots
    enc, dec = AcelpEncoder(), AcelpDecoder()
    outs = []
    for s in range(len(pcm) // 480):
        frames = enc.encode_slot(pcm[s * 480:(s + 1) * 480])
        type3 = vch.encode_slot(frames.reshape(-1))
        decoded, bfi = vch.decode_slot(type3[None])
        assert not bfi[0]
        assert (decoded[0].reshape(2, 137) == frames).all()
        outs.append(dec.decode_slot(decoded[0]))
    y = np.concatenate(outs).astype(float)
    seg = y[2000:] - y[2000:].mean()
    ac = np.correlate(seg, seg, "full")[len(seg) - 1:]
    peak = np.argmax(ac[40:120]) + 40
    assert 71 <= peak <= 75, peak


def test_acelp_lsf_lpc_roundtrip():
    """The codec's Chebyshev LSF root finder inverts its LSP synthesis for
    random stable AR(10) polynomials (coefficient error < 0.05)."""
    import ctypes
    from tetra_tpu.voice import acelp as am
    lib = am._load()
    lib.tetra_acelp_lpc_to_lsf.argtypes = [
        ctypes.POINTER(ctypes.c_float)] * 2
    lib.tetra_acelp_lsf_to_lpc.argtypes = [
        ctypes.POINTER(ctypes.c_float)] * 2

    def conv(fn, v):
        v = np.ascontiguousarray(v, np.float32)
        out = np.zeros(10, np.float32)
        fn(v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
           out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out

    rng = np.random.default_rng(11)
    for _ in range(25):
        poles = []
        for _ in range(5):
            r = rng.uniform(0.5, 0.95)
            th = rng.uniform(0.1, np.pi - 0.1)
            poles += [r * np.exp(1j * th), r * np.exp(-1j * th)]
        a = np.real(np.poly(poles))[1:]
        lsf = conv(lib.tetra_acelp_lpc_to_lsf, a)
        assert (np.diff(lsf) > 0).all() and lsf[0] > 0 and lsf[-1] < np.pi
        a2 = conv(lib.tetra_acelp_lsf_to_lpc, lsf)
        assert np.abs(a2 - a).max() < 0.05


def test_acelp_encoder_edge_inputs():
    """Silence, white noise and full-scale input all encode to well-formed
    frames that decode to finite, bounded audio."""
    from tetra_tpu.voice.acelp import AcelpDecoder, AcelpEncoder
    enc, dec = AcelpEncoder(), AcelpDecoder()
    cases = [
        np.zeros(240 * 4, np.int16),
        (RNG.standard_normal(240 * 4) * 6000).astype(np.int16),
        (np.sign(np.sin(2 * np.pi * 180 * np.arange(240 * 4) / 8000))
         * 32767).astype(np.int16),
    ]
    for pcm in cases:
        for i in range(len(pcm) // 240):
            bits = enc.encode_frame(pcm[i * 240:(i + 1) * 240])
            assert bits.shape == (137,)
            assert set(np.unique(bits)) <= {0, 1}
            out = dec.decode_frame(bits).astype(float)
            assert np.isfinite(out).all()
    # silence stays quiet after the codec (no noise pumping)
    dec2 = AcelpDecoder()
    enc2 = AcelpEncoder()
    quiet = np.concatenate([
        dec2.decode_frame(enc2.encode_frame(np.zeros(240, np.int16)))
        for _ in range(6)]).astype(float)
    assert np.sqrt(np.mean(quiet[480:] ** 2)) < 500.0


def test_voice_pipeline_slot_flow():
    from tetra_tpu.rx.tdma import TdmaTime
    from tetra_tpu.voice.pipeline import VoicePipeline
    vp = VoicePipeline()
    frames = RNG.integers(0, 2, (2, 137)).astype(np.uint8)
    slot_bits = vch.encode_slot(frames.reshape(-1))
    t = TdmaTime(mn=3, fn=5, tn=2, sn=1)
    vp(t, slot_bits)
    # second traffic slot in the same frame is ignored (active-slot gate)
    t2 = TdmaTime(mn=3, fn=5, tn=3, sn=1)
    vp(t2, slot_bits)
    audio = vp.take_audio()
    assert audio.shape == (480,)
    assert vp.slots_decoded == 1
    assert vp.bad_frames == 0


def test_half_slot_loopback_clean():
    """Half-stolen slot speech: one frame in 216 bits, clean round trip."""
    frames = RNG.integers(0, 2, (4, 137)).astype(np.uint8)
    halves = np.stack([vch.encode_half_slot(f) for f in frames])
    assert halves.shape == (4, 216)
    dec, bfi = vch.decode_half_slot(halves)
    assert (dec == frames).all()
    assert not bfi.any()


def test_half_slot_error_correction_and_bfi():
    frame = RNG.integers(0, 2, 137).astype(np.uint8)
    half = vch.encode_half_slot(frame)
    # a few channel errors: protected classes must correct them
    err = half.copy()
    err[[60, 120, 180]] ^= 1
    dec, bfi = vch.decode_half_slot(err[None])
    # class 1+2 bits (positions from the reorder) must survive
    prot = np.concatenate([vch._CLASS1_POS, vch._CLASS2_POS]) - 1
    assert (dec[0][prot] == frame[prot]).all()
    # heavy corruption of the class-2 region flips BFI
    bad = half.copy()
    bad[RNG.permutation(216)[:90]] ^= 1
    _, bfi2 = vch.decode_half_slot(bad[None])
    assert bfi2[0]


def test_voice_pipeline_half_slot_flow():
    from tetra_tpu.rx.tdma import TdmaTime
    from tetra_tpu.voice.pipeline import VoicePipeline
    vp = VoicePipeline()
    frame = RNG.integers(0, 2, 137).astype(np.uint8)
    t = TdmaTime(mn=3, fn=6, tn=2, sn=1)
    vp.half(t, vch.encode_half_slot(frame))
    audio = vp.take_audio()
    # audio clock stays 480/slot: 240 silence (stolen frame) + 240 decoded
    assert audio.shape == (480,)
    assert (audio[:240] == 0).all()
    assert vp.slots_decoded == 1 and vp.bad_frames == 0


def test_audio_output_rate_change():
    """AudioOutput handles runtime sample-rate changes (the reference's
    sampleRateChangeHandler): lengths and silence padding track the new
    rate."""
    from tetra_tpu.voice.audio_out import AudioOutput

    ao = AudioOutput(out_rate=48_000)
    pcm = (np.sin(2 * np.pi * 440 / 8000 * np.arange(480))
           * 8000).astype(np.int16)
    y = ao.render(pcm)
    # block resampler trims the (taps-1)-sample transient
    assert len(y) == (480 - 24) * 6 * 2   # 8k -> 48k, stereo interleaved
    assert len(ao.silence(480)) == 480 * 6 * 2
    ao.set_out_rate(16_000)
    y = ao.render(pcm)
    assert len(y) == (480 - 24) * 2 * 2
    assert ao.out_rate == 16_000
    # stereo interleave duplicates channels
    assert np.array_equal(y[0::2], y[1::2])


def test_slot_interleaver_is_matrix_5_5_3():
    """The slot interleaver equals EN 300 395-2 5.5.3 matrix interleaving
    with the reference matrix_interleave's fixed semantics
    (tetra_interleave.c:62-70): out[i*lines + j] = in[j*columns + i],
    24 lines x 18 columns (half slot: 12 x 18)."""
    perm = vch._perm_pair(vch._IL_LINES, vch._IL_COLUMNS, False)[0]
    want = np.empty(432, np.int64)
    for i in range(18):
        for j in range(24):
            want[i * 24 + j] = j * 18 + i
    assert (perm == want).all()
    perm_h = vch._perm_pair(vch._IL_HALF_LINES, 18, False)[0]
    want_h = np.empty(216, np.int64)
    for i in range(18):
        for j in range(12):
            want_h[i * 12 + j] = j * 18 + i
    assert (perm_h == want_h).all()


def test_frame_layout_documented_order():
    """The native codec packs/unpacks the 137-bit frame exactly per
    voice/acelp.FRAME_LAYOUT (3 LSP indices then per-subframe
    [pitch, code, gain]): flipping a field's bits changes ONLY behavior
    attributable to that field."""
    from tetra_tpu.voice.acelp import FRAME_LAYOUT, frame_field
    # layout covers 137 bits contiguously, in documented order
    pos = 0
    for name, off, w in FRAME_LAYOUT:
        assert off == pos, name
        pos += w
    assert pos == 137
    assert frame_field("pitch1") == (26, 8)
    assert [frame_field(f"code{i}")[1] for i in (1, 2, 3, 4)] == [16] * 4
    assert [frame_field(f"gain{i}")[1] for i in (1, 2, 3, 4)] == [6] * 4
    # decoder consumes gains from the per-subframe position: max code gain
    # in subframe 1 only -> energy concentrated in the first subframe
    from tetra_tpu.voice.acelp import AcelpDecoder
    dec = AcelpDecoder()
    f = np.zeros(137, np.uint8)
    _neutral_lsf_bits(f)
    g1, _ = frame_field("gain1")
    c1, _ = frame_field("code1")
    f[c1:c1 + 16] = [1, 1, 1, 0] * 4
    f[g1 + 3:g1 + 6] = [1, 1, 1]          # code gain max, subframe 1 only
    a = dec.decode_frame(f).astype(float)
    e_sub = [np.sum(a[60 * k:60 * (k + 1)] ** 2) for k in range(4)]
    assert e_sub[0] > 3 * (e_sub[2] + e_sub[3] + 1e-9)


def test_codec_runtime_tables_roundtrip(tmp_path):
    """VERDICT r2 item 5a (codebook half): runtime-loaded quantizer tables
    switch the native codec's LSF split-VQ and gain field to table mode --
    an encode/decode pair under the loaded tables must reproduce each
    other's parameters (indices round-trip through the 137-bit frame), and
    clearing reverts to the built-in quantizers."""
    from tetra_tpu.voice.acelp import (AcelpDecoder, AcelpEncoder,
                                       clear_codec_tables, load_codec_tables,
                                       _load)
    rng = np.random.default_rng(7)
    # synthetic stand-in tables with the ETSI shapes: LSF codevectors
    # scattered around plausible ordered positions, absolute VQ
    means = np.array([0.24, 0.47, 0.81, 1.12, 1.44, 1.78, 2.09, 2.40,
                      2.68, 2.94], np.float32)
    cb1 = (means[:3] + rng.normal(0, 0.08, (256, 3))).astype(np.float32)
    cb2 = (means[3:6] + rng.normal(0, 0.08, (512, 3))).astype(np.float32)
    cb3 = (means[6:] + rng.normal(0, 0.08, (512, 4))).astype(np.float32)
    gain = np.stack([rng.uniform(0, 1.2, 64),
                     np.exp(rng.uniform(2.0, 7.0, 64))], 1).astype(np.float32)
    path = tmp_path / "tables.npz"
    np.savez(path, lsf_cb1=cb1, lsf_cb2=cb2, lsf_cb3=cb3, gain_cb=gain,
             lsf_pred=np.float32(0.0))
    try:
        load_codec_tables(str(path))
        assert _load().tetra_acelp_tables_loaded() == 1
        enc, dec = AcelpEncoder(), AcelpDecoder()
        t = np.arange(240 * 6) / 8000.0
        pcm = (6000 * np.sin(2 * np.pi * 150 * t)
               * (0.6 + 0.4 * np.sin(2 * np.pi * 3 * t))).astype(np.int16)
        outs = []
        for f in range(6):
            bits = enc.encode_frame(pcm[f * 240:(f + 1) * 240])
            assert bits.shape == (137,)
            outs.append(dec.decode_frame(bits))
        audio = np.concatenate(outs).astype(float)
        assert np.isfinite(audio).all()
        rms = np.sqrt(np.mean(audio[480:] ** 2))
        assert 100 < rms < 32000, rms   # live, bounded synthesis
    finally:
        clear_codec_tables()
    assert _load().tetra_acelp_tables_loaded() == 0


def test_codec_profile_half_slot_crc4_calibration():
    """Stolen-half slots carry their own CRC-4 assumption: the calibrator
    must resolve it independently from repeated half-slot CRC failure
    (alternate CRC-4 generator on the TX side), after which halves decode
    clean and bit-exact."""
    from tetra_tpu.rx.tdma import TdmaTime
    from tetra_tpu.voice.pipeline import VoicePipeline

    default = vch.get_profile()
    alt = vch.CodecProfile(crc4_poly=0x9, name="alt-crc4")
    assert alt.crc4_poly != default.crc4_poly
    frames = RNG.integers(0, 2, (12, 137)).astype(np.uint8)
    halves = [vch.encode_half_slot(f, profile=alt) for f in frames]
    try:
        vp = VoicePipeline(calibrate=True)
        msgs = []
        vp.calibrator.log = msgs.append
        for i, h in enumerate(halves):
            t = TdmaTime(mn=4, fn=(i % 18) + 1, tn=3, sn=1)
            vp.half(t, h)
        resolved = vp.calibrator.resolved_half
        assert resolved is not None, "half-slot calibration never fired"
        assert resolved.crc4_poly == alt.crc4_poly
        assert msgs and "crc4" in msgs[0]
        assert vp.profile is resolved and vch.get_profile() is default
        assert vp.calibration_status()["half"] == "resolved"
        dec, bfi = vch.decode_half_slot(np.stack(halves[-3:]),
                                        profile=vp.profile)
        assert not bfi.any()
        assert (dec == frames[-3:]).all()
    finally:
        vch.set_profile(default)


def test_calibration_is_per_pipeline_and_reports_exhaustion():
    """Two pipelines calibrating concurrently: channel A's resolution must
    not leak into channel B's decoding (the old global set_profile meant
    last-writer-wins across every channel); and a network whose generator
    is OUTSIDE the shortlist must be visibly diagnosed as exhausted, not
    silently re-searched forever."""
    from tetra_tpu.rx.tdma import TdmaTime
    from tetra_tpu.voice.pipeline import VoicePipeline

    default = vch.get_profile()
    alt = vch.CodecProfile(crc8_poly=0x07, il_transposed=True, name="alt-tx")
    frames = RNG.integers(0, 2, (14, 2, 137)).astype(np.uint8)
    slots_alt = [vch.encode_slot(f.reshape(-1), profile=alt) for f in frames]
    slots_def = [vch.encode_slot(f.reshape(-1)) for f in frames]
    try:
        vp_a = VoicePipeline(calibrate=True)
        vp_b = VoicePipeline(calibrate=True)
        for i in range(len(frames)):
            t = TdmaTime(mn=3, fn=(i % 18) + 1, tn=2, sn=1)
            vp_a(t, slots_alt[i])
            vp_b(t, slots_def[i])
        assert vp_a.calibrator.resolved is not None
        assert vp_a.profile.crc8_poly == alt.crc8_poly
        # B's traffic decodes clean under the default; A's resolution must
        # not have touched B's profile or the global
        assert vp_b.profile is None and vp_b.calibrator.resolved is None
        assert vp_b.bad_frames == 0
        assert vch.get_profile() is default

        # out-of-shortlist generator: status must report exhausted
        far = vch.CodecProfile(crc8_poly=0xD5, name="off-list")
        assert far.crc8_poly not in vch.ProfileCalibrator.CRC8_SHORTLIST
        slots_far = [vch.encode_slot(f.reshape(-1), profile=far)
                     for f in frames]
        vp_c = VoicePipeline(calibrate=True)
        for i, s in enumerate(slots_far):
            t = TdmaTime(mn=5, fn=(i % 18) + 1, tn=2, sn=1)
            vp_c(t, s)
        st = vp_c.calibration_status()
        assert st["full"] == "exhausted" and st["searches"] >= 1
        assert vp_c.calibrator.resolved is None
    finally:
        vch.set_profile(default)


def test_codec_tables_tooling(tmp_path):
    """VERDICT r3 item 6: a user holding the real ETSI tables must get a
    working drop-in with zero code reading.  Drive scripts/codec_tables.py
    end to end: template -> validate (ok), a synthetic ETSI-style C source
    through from-c with Q13/Q14 conversions -> validate (ok), and a
    wrong-units file must be diagnosed, not silently accepted."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "codec_tables", os.path.join(os.path.dirname(__file__), "..",
                                     "scripts", "codec_tables.py"))
    ct = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ct)

    tpl = tmp_path / "demo.npz"
    ct.make_template(str(tpl))
    assert ct.validate(str(tpl))

    # synthetic "ETSI source": Q13 normalized-frequency LSF tables + Q14
    # pitch / Q0 code gains as C initializer lists (comments, 2-D braces)
    rng = np.random.default_rng(5)
    means = np.array([0.24, 0.47, 0.81, 1.12, 1.44, 1.78, 2.09, 2.40,
                      2.68, 2.94])
    q13 = 8192 / np.pi
    def carr(name, arr, as_int=True):
        rows = [", ".join(str(int(round(v)) if as_int else float(v))
                          for v in row) for row in arr]
        inner = ",\n  ".join("{" + r + "}" for r in rows)
        return f"static const Word16 {name}[{len(arr)}][{arr.shape[1]}] " \
               f"= {{\n  {inner}\n}};\n"
    cb1 = (means[:3] + rng.normal(0, 0.05, (256, 3))) * q13
    cb2 = (means[3:6] + rng.normal(0, 0.05, (512, 3))) * q13
    cb3 = (means[6:] + rng.normal(0, 0.05, (512, 4))) * q13
    gains = np.stack([rng.uniform(0, 1.2, 64) * 16384,
                      np.exp(rng.uniform(2.0, 7.0, 64))], 1)
    src = tmp_path / "tab_lsp.c"
    src.write_text("/* ETSI-style table file */\n"
                   + carr("dico1_lsf", cb1) + carr("dico2_lsf", cb2)
                   + carr("dico3_lsf", cb3) + carr("gain_table", gains))
    out = tmp_path / "etsi.npz"
    rc = ct.main(["from-c", str(src), "--lsf1", "dico1_lsf",
                  "--lsf2", "dico2_lsf", "--lsf3", "dico3_lsf",
                  "--gain", "gain_table", "-o", str(out),
                  "--scale", str(np.pi / 8192),
                  "--gain-pitch-scale", str(1 / 16384)])
    assert rc == 0
    z = np.load(out)
    assert z["lsf_cb1"].shape == (256, 3)
    np.testing.assert_allclose(z["lsf_cb2"],
                               np.round(cb2) * np.pi / 8192, atol=1e-5)
    assert ct.validate(str(out))

    # wrong units (raw Q13 without --scale) must be diagnosed via warnings
    rc2 = ct.main(["from-c", str(src), "--lsf1", "dico1_lsf",
                   "--lsf2", "dico2_lsf", "--lsf3", "dico3_lsf",
                   "--gain", "gain_table", "-o", str(tmp_path / "bad.npz")])
    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    with redirect_stdout(buf):
        ct.validate(str(tmp_path / "bad.npz"))
    import json as _json
    verdict = _json.loads(buf.getvalue().strip().splitlines()[-1])
    assert any("fixed-point" in w or "(0, pi)" in w
               for w in verdict["warnings"]), verdict


def test_codec_profile_mux_order_calibration_converges():
    """VERDICT r4 item 4: the clause-5.5.1 type-3 MULTIPLEX order (the one
    PARITY.md row still rated *assumed* with no runtime recovery) is now a
    calibration axis.  A TX stream concatenating [c2 | c1 | c0] instead of
    the assumed [c0 | c1 | c2] must resolve from repeated CRC failure
    alone, after which slots decode clean and bit-exact."""
    from tetra_tpu.rx.tdma import TdmaTime
    from tetra_tpu.voice.pipeline import VoicePipeline

    alt = vch.CodecProfile(mux_order="210", name="alt-mux-tx")
    default = vch.get_profile()
    frames = RNG.integers(0, 2, (14, 2, 137)).astype(np.uint8)
    slots = [vch.encode_slot(f.reshape(-1), profile=alt) for f in frames]
    vp = VoicePipeline(calibrate=True)
    for i, slot in enumerate(slots):
        t = TdmaTime(mn=3, fn=(i % 18) + 1, tn=2, sn=1)
        vp(t, slot)
    resolved = vp.calibrator.resolved
    assert resolved is not None, "mux-order calibration never fired"
    assert resolved.mux_order == "210"
    assert resolved.crc8_poly == alt.crc8_poly
    assert vch.get_profile() is default
    dec, bfi = vch.decode_slot(np.stack(slots[-3:]), profile=vp.profile)
    assert not bfi.any()
    assert (dec == frames[-3:]).all()


def test_mux_order_roundtrip_all_orders():
    """Every multiplex order is self-consistent (encode/decode loopback,
    full and half slot) and produces a DIFFERENT wire image than the
    default (the calibration axis is real, not a no-op)."""
    frames = RNG.integers(0, 2, (2, 137)).astype(np.uint8)
    ref_full = vch.encode_slot(frames.reshape(-1))
    ref_half = vch.encode_half_slot(frames[0])
    for order in ("021", "102", "120", "201", "210"):
        prof = vch.CodecProfile(mux_order=order, name=f"mux-{order}")
        full = vch.encode_slot(frames.reshape(-1), profile=prof)
        assert not (full == ref_full).all(), order
        dec, bfi = vch.decode_slot(full[None], profile=prof)
        assert not bfi.any() and (dec[0] == frames).all(), order
        half = vch.encode_half_slot(frames[0], profile=prof)
        assert not (half == ref_half).all(), order
        fdec, hbfi = vch.decode_half_slot(half[None], profile=prof)
        assert not hbfi.any() and (fdec[0] == frames[0]).all(), order
