"""Native IQ stream runtime tests (ring buffer, file pacing, UDP)."""

import socket
import time

import numpy as np

from tetra_tpu.runtime.iq_stream import IqStream


def test_file_stream_roundtrip(tmp_path):
    data = (np.arange(30000) - 1j * np.arange(30000)).astype(np.complex64)
    f = tmp_path / "x.cf32"
    data.tofile(f)
    s = IqStream()
    s.feed_file(str(f))
    got = []
    while True:
        blk = s.read(4096, timeout_ms=500)
        if len(blk) == 0:
            break
        got.append(blk)
    out = np.concatenate(got)
    assert np.array_equal(out, data)
    assert s.overruns == 0 and s.eof
    s.stop()


def test_udp_stream(tmp_path):
    s = IqStream()
    s.open_udp(19877)
    sk = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    data = (np.ones(4096) * (1 + 2j)).astype(np.complex64)
    for i in range(0, 4096, 512):
        sk.sendto(data[i:i + 512].tobytes(), ("127.0.0.1", 19877))
    time.sleep(0.3)
    blk = s.read(4096, timeout_ms=1000)
    assert len(blk) == 4096
    assert np.array_equal(blk, data)
    s.stop()


def test_overrun_accounting(tmp_path):
    data = np.zeros(5000, np.complex64)
    f = tmp_path / "o.cf32"
    data.tofile(f)
    s = IqStream(capacity=1024)  # tiny ring: file floods it
    s.feed_file(str(f))
    time.sleep(0.5)
    assert s.overruns > 0
    assert s.level <= 1024
    s.stop()
