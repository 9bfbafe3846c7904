"""CLI smoke tests (subprocess, CPU backend)."""

import json
import os
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tetra_tpu import params as P
from tetra_tpu.rx.tdma import TdmaTime
from tetra_tpu.tx import cell
from tetra_tpu.tx.channel import channel
from tetra_tpu.tx.modulator import modulate

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def capture(tmp_path_factory):
    cfg = cell.CellConfig()
    bits, _ = cell.downlink_bits(cfg, 170, start=TdmaTime(mn=1, fn=17, tn=4))
    iq = modulate(jnp.asarray(bits[None, :]))
    iq = np.asarray(channel(iq, jax.random.key(3), snr_db=25.0, cfo_hz=200.0,
                            sample_rate=P.SAMPLE_RATE))[0]
    p = tmp_path_factory.mktemp("cli") / "capture.cf32"
    iq.astype(np.complex64).tofile(p)
    return str(p), cfg


def _run_cli(args):
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, "-m", "tetra_tpu.apps.tetra_rx", *args],
        capture_output=True, text=True, timeout=240, env=env)


def test_cli_decode_mode(capture):
    path, cfg = capture
    r = _run_cli([path, "--status-every", "5"])
    assert r.returncode == 0, r.stderr[-500:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary[0]["locked"]
    assert summary[0]["mcc"] == cfg.mcc
    assert summary[0]["mnc"] == cfg.mnc


def test_cli_decode_cs16_capture(capture, tmp_path):
    """The same capture stored as interleaved int16 (SDR++/HackRF raw
    format) must decode identically via --format/extension inference."""
    path, cfg = capture
    iq = np.fromfile(path, np.complex64)
    flat = np.stack([iq.real, iq.imag], axis=1).reshape(-1)
    flat = flat * (32000.0 / np.abs(flat).max())   # typical full-scale capture
    inter = np.round(flat).astype(np.int16)
    p16 = tmp_path / "capture.cs16"
    inter.tofile(p16)
    r = _run_cli([str(p16), "--status-every", "5"])
    assert r.returncode == 0, r.stderr[-500:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary[0]["locked"] and summary[0]["mcc"] == cfg.mcc


def test_load_iq_formats_agree(capture, tmp_path):
    """load_iq must return the same signal (up to quantization) for cf32,
    cs16, cu8 raw formats and a 2-channel s16 IQ WAV."""
    import wave
    from tetra_tpu.apps.tetra_rx import load_iq
    path, _ = capture
    ref = np.fromfile(path, np.complex64)[:4096]
    flat = np.stack([ref.real, ref.imag], axis=1).reshape(-1)
    scale = 32000.0 / np.abs(flat).max()
    s16 = np.round(flat * scale).astype(np.int16)
    (tmp_path / "a.cs16").write_bytes(s16.tobytes())
    u8 = np.round(flat * (120.0 / np.abs(flat).max()) + 127.5).astype(np.uint8)
    (tmp_path / "a.cu8").write_bytes(u8.tobytes())
    with wave.open(str(tmp_path / "a.wav"), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(36000)
        w.writeframes(s16.tobytes())
    for name, tol in (("a.cs16", 2e-4), ("a.cu8", 2e-2), ("a.wav", 2e-4)):
        got = load_iq(str(tmp_path / name))
        assert len(got) == len(ref), name
        g = got / np.abs(got).max()
        r = ref / np.abs(ref).max()
        assert np.abs(g - r).max() < tol, name


def test_load_iq_wav_rate_mismatch(tmp_path):
    """A WAV recorded at an SDR rate (not 36 kHz) must raise with a resample
    hint instead of silently never locking (ADVICE round 1)."""
    import wave
    import pytest
    from tetra_tpu.apps.tetra_rx import load_iq
    with wave.open(str(tmp_path / "b.wav"), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(2_400_000)
        w.writeframes(np.zeros(256, np.int16).tobytes())
    with pytest.raises(ValueError, match="2400000 Hz.*36000"):
        load_iq(str(tmp_path / "b.wav"), expect_rate=36000)
    # matching rate passes; no expectation passes too (library use)
    assert len(load_iq(str(tmp_path / "b.wav"), expect_rate=2_400_000)) == 128
    assert len(load_iq(str(tmp_path / "b.wav"))) == 128


def test_format_of_warns_on_unknown_sample_suffix(capsys):
    """An unrecognized extension that looks like a sample format (.sc8,
    .cs12) warns to stderr before the cf32 fallback (ADVICE round 1)."""
    from tetra_tpu.apps.tetra_rx import _format_of
    assert _format_of("x.sc8", None) == "cf32"
    assert "warning" in capsys.readouterr().err
    assert _format_of("x.cs12", None) == "cf32"
    assert "warning" in capsys.readouterr().err
    for benign in ("x.raw", "x.iq", "x.cf32", "x.dat", "noext"):
        _format_of(benign, None)
        assert capsys.readouterr().err == "", benign


def test_cli_netsyms_mode(capture):
    path, _ = capture
    import socket
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sock.bind(("127.0.0.1", 0))
    sock.settimeout(0.1)
    port = sock.getsockname()[1]
    r = _run_cli([path, "--mode", "1", "--udp", f"127.0.0.1:{port}"])
    assert r.returncode == 0, r.stderr[-500:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["mode"] == 1 and out["ts_found"]
    # bits actually arrived
    total = 0
    try:
        while True:
            d, _ = sock.recvfrom(65536)
            total += len(d)
    except socket.timeout:
        pass
    assert total > 10000


def test_cli_verbose_config_state(capture, tmp_path):
    """-v prints decoded PDUs; --config persists settings; --state resumes
    without re-acquisition."""
    path, cfg = capture
    cfgfile = str(tmp_path / "rx.json")
    statefile = str(tmp_path / "rx.npz")
    r = _run_cli([path, "-v", "--config", cfgfile, "--state", statefile,
                  "--status-every", "9", "--block", "8192"])
    assert r.returncode == 0, r.stderr[-500:]
    assert "SYSINFO" in r.stdout
    assert "MAC-RESOURCE ssi=0x123456" in r.stdout
    assert "LLC BL-UDATA CMCE D-SDS DATA" in r.stdout
    saved = json.load(open(cfgfile))
    assert saved["block"] == 8192
    assert os.path.exists(statefile)
    first = json.loads(r.stdout.strip().splitlines()[-1])

    # resume on the same capture: config supplies block=8192 as the default,
    # the checkpoint restores lock (no cold-start CRC failures)
    r2 = _run_cli([path, "--config", cfgfile, "--state", statefile,
                   "--status-every", "9"])
    assert r2.returncode == 0, r2.stderr[-500:]
    second = json.loads(r2.stdout.strip().splitlines()[-1])
    assert second[0]["locked"] and second[0]["mcc"] == cfg.mcc
    # resumed run starts locked with the scrambling known: total failures
    # barely grow (an unresumed run would repeat ~first[0] cold-start fails)
    assert second[0]["crc_fail"] - first[0]["crc_fail"] < 30
    assert second[0]["crc_ok"] > first[0]["crc_ok"] * 1.5


def test_multihost_launcher_selftest():
    """Multi-host bring-up launcher: virtual 2x4 (host, chip) mesh in one
    process, synthetic per-host cells, end-of-run decode validation."""
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    r = subprocess.run(
        [sys.executable, "-m", "tetra_tpu.apps.multihost", "--hosts", "2",
         "--chips", "4", "--channels", "16", "--selftest",
         "--status-every", "0"],
        capture_output=True, text=True, env=env, timeout=900)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "SELFTEST PASS" in r.stdout
    assert "mesh (host=2, chip=4)" in r.stdout


def test_cli_mac_workers_pool(capture):
    """--mac-workers N: pooled host-MAC dispatch decodes identically."""
    path, cfg = capture
    r = _run_cli([path, "--mac-workers", "2", "--status-every", "5"])
    assert r.returncode == 0, r.stderr[-800:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary[0]["locked"]
    assert summary[0]["mcc"] == cfg.mcc
    assert summary[0]["crc_ok"] > 50
    # same decode tallies as the in-process run
    r2 = _run_cli([path, "--status-every", "5"])
    s2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert summary == s2


def test_cli_voice_and_audio_rate(tmp_path):
    """--voice writes s16 8k PCM; --audio-rate renders the reference audio
    tail (rational resample + stereo interleave) as float32."""
    rng = np.random.default_rng(9)
    framegen = lambda: rng.integers(0, 2, (2, 137)).astype(np.uint8)
    cfg = cell.CellConfig()
    bits, _ = cell.downlink_bits(cfg, 170, start=TdmaTime(mn=1, fn=17, tn=4),
                                 voice_slots={2: framegen})
    iq = modulate(jnp.asarray(bits[None, :]))
    iq = np.asarray(channel(iq, jax.random.key(3), snr_db=28.0, cfo_hz=100.0,
                            sample_rate=P.SAMPLE_RATE))[0]
    cap = tmp_path / "voicecap.cf32"
    iq.astype(np.complex64).tofile(cap)

    raw = tmp_path / "voice.s16"
    r = _run_cli([str(cap), "--voice", str(raw), "--status-every", "10"])
    assert r.returncode == 0, r.stderr[-500:]
    pcm = np.fromfile(raw, np.int16)
    assert len(pcm) >= 480 and len(pcm) % 480 == 0

    hi = tmp_path / "voice.f32"
    r = _run_cli([str(cap), "--voice", str(hi), "--audio-rate", "48000",
                  "--status-every", "10"])
    assert r.returncode == 0, r.stderr[-500:]
    audio = np.fromfile(hi, np.float32)
    # 48k stereo: ~12x the 8k mono sample count (6x rate * 2 channels)
    assert abs(len(audio) - 12 * len(pcm)) < 0.05 * len(audio)
    assert np.abs(audio).max() <= 4.0  # unclamped float path; ringing ok


def test_cli_profile_trace(capture, tmp_path):
    """--profile must write a loadable JAX trace and not disturb decode."""
    path, cfg = capture
    tdir = tmp_path / "trace"
    r = _run_cli([path, "--status-every", "5", "--profile", str(tdir)])
    assert r.returncode == 0, r.stderr[-500:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary[0]["locked"] and summary[0]["mcc"] == cfg.mcc
    traces = list(tdir.rglob("*.xplane.pb")) + list(tdir.rglob("*.trace.json.gz"))
    assert traces, f"no trace files under {tdir}"


def test_cli_dashboard_and_metrics(capture, tmp_path):
    """--dashboard renders the panel incl. ASCII constellation; --metrics
    appends structured DisplayState records (SURVEY.md section 5:
    'export the same fields as structured metrics')."""
    path, cfg = capture
    mfile = tmp_path / "metrics.jsonl"
    r = _run_cli([path, "--dashboard", "--metrics", str(mfile),
                  "--status-every", "0.7"])
    assert r.returncode == 0, r.stderr[-500:]
    assert "constellation ch0" in r.stdout
    assert "receiver status" in r.stdout
    recs = [json.loads(l) for l in open(mfile)]
    assert len(recs) >= 2
    last = recs[-1]
    assert last["locked"] and last["mcc"] == cfg.mcc
    for field in ("dl_freq", "timeslot_content", "crc_ok", "quality",
                  "voice_service", "curr_multiframe"):
        assert field in last


def _run_tx(args):
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, "-m", "tetra_tpu.apps.tetra_tx", *args],
        capture_output=True, text=True, timeout=240, env=env)


def test_cli_tx_then_rx_roundtrip(tmp_path):
    """tetra_tx generates a voiced downlink capture that tetra_rx locks to
    and decodes with the commanded cell identity."""
    out = str(tmp_path / "dl.cf32")
    r = _run_tx([out, "--slots", "200", "--voice-tn", "2",
                 "--mcc", "901", "--mnc", "4321", "--cc", "13",
                 "--cfo", "250", "--snr", "28"])
    assert r.returncode == 0, r.stderr[-500:]
    info = json.loads(r.stdout.strip().splitlines()[-1])
    assert info["sample_rate"] == 36000 and info["samples"] > 0
    rx = _run_cli([out, "--status-every", "100"])
    assert rx.returncode == 0, rx.stderr[-500:]
    summary = json.loads(rx.stdout.strip().splitlines()[-1])
    assert summary[0]["locked"]
    assert summary[0]["mcc"] == 901 and summary[0]["mnc"] == 4321
    assert summary[0]["crc_ok"] > 50


def test_cli_tx_wav_speech(tmp_path):
    """A WAV speech source feeds the encoder and survives to voice slots."""
    import wave
    fs = 8000
    t = np.arange(fs) / fs
    pcm = (8000 * np.sin(2 * np.pi * 220 * t)).astype(np.int16)
    wav = str(tmp_path / "in.wav")
    with wave.open(wav, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(fs)
        w.writeframes(pcm.tobytes())
    out = str(tmp_path / "dl.cf32")
    r = _run_tx([out, "--slots", "80", "--voice-tn", "2", "--speech", wav])
    assert r.returncode == 0, r.stderr[-500:]
    info = json.loads(r.stdout.strip().splitlines()[-1])
    assert info["voice_tn"] == 2


def test_cli_tx_encrypted_rx_decrypts(tmp_path):
    """--keystore on both CLIs: TX encrypts the downlink (CCK), RX without
    keys sees no LLC SDUs, RX with the same keystore decodes them."""
    keyfile = str(tmp_path / "keys.txt")
    with open(keyfile, "w") as f:
        f.write("network mcc 262 mnc 1234 ksg_type 1 security_class 2\n")
        f.write("key mcc 262 mnc 1234 addr 0 key_type 1 key_num 3 "
                "key 00112233445566778899\n")
    out = str(tmp_path / "enc.cf32")
    r = _run_tx([out, "--slots", "300", "--keystore", keyfile])
    assert r.returncode == 0, r.stderr[-500:]

    rx_plain = _run_cli([out, "-v", "--status-every", "100"])
    assert rx_plain.returncode == 0, rx_plain.stderr[-500:]
    rx_keys = _run_cli([out, "-v", "--keystore", keyfile,
                        "--status-every", "100"])
    assert rx_keys.returncode == 0, rx_keys.stderr[-500:]
    llc_plain = [l for l in rx_plain.stdout.splitlines() if "LLC" in l]
    llc_keys = [l for l in rx_keys.stdout.splitlines() if "LLC" in l]
    assert len(llc_plain) == 0
    assert len(llc_keys) > 20


def test_cli_tx_wideband_rx_channelized(tmp_path):
    """tetra_tx --wideband emits an N x 25 kHz multiplex that tetra_rx
    --wideband channelizes and locks on the populated indices."""
    out = str(tmp_path / "wide.cf32")
    r = _run_tx([out, "--slots", "220", "--wideband", "8",
                 "--channels", "1,5", "--mcc", "310", "--mnc", "77"])
    assert r.returncode == 0, r.stderr[-500:]
    info = json.loads(r.stdout.strip().splitlines()[-1])
    assert info["sample_rate"] == 8 * 25_000
    rx = _run_cli([out, "--wideband", "8", "--status-every", "100"])
    assert rx.returncode == 0, rx.stderr[-500:]
    summary = json.loads(rx.stdout.strip().splitlines()[-1])
    locked = {s["channel"] for s in summary if s["locked"]}
    assert {1, 5} <= locked
    for s in summary:
        if s["channel"] in (1, 5):
            assert s["mcc"] == 310 and s["mnc"] == 77 and s["crc_ok"] > 30


def test_cli_fleet_wideband_superblock(tmp_path):
    """--fleet --wb-k exposes the production fleet/superblock path from the
    CLI: same capture as the python-path wideband test, locked + decoded
    through the native engine."""
    out = str(tmp_path / "widef.cf32")
    r = _run_tx([out, "--slots", "220", "--wideband", "8",
                 "--channels", "1,5", "--mcc", "310", "--mnc", "77"])
    assert r.returncode == 0, r.stderr[-500:]
    rx = _run_cli([out, "--wideband", "8", "--fleet", "--wb-k", "2",
                   "--status-every", "100"])
    assert rx.returncode == 0, rx.stderr[-500:]
    summary = json.loads(rx.stdout.strip().splitlines()[-1])
    locked = {s["channel"] for s in summary if s["locked"]}
    assert {1, 5} <= locked
    for s in summary:
        if s["channel"] in (1, 5):
            assert s["mcc"] == 310 and s["mnc"] == 77 and s["crc_ok"] > 30
