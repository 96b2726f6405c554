"""Round-trip and reference-decoder tests for the native miniSEED codec."""
import numpy as np
import pytest

from xcorr_tpu.native import mseed
from xcorr_tpu.stream import Stats, Trace

pytestmark = pytest.mark.skipif(not mseed.available(),
                                reason="native codec unavailable")


def make_trace(n=10_000, fs=50.0, amp=1000.0, seed=0):
    rng = np.random.default_rng(seed)
    data = np.round(amp * rng.standard_normal(n)).astype(np.int32)
    stats = Stats(network="IU", station="RAR", location="10",
                  channel="BHZ", starttime="2014-01-02T03:04:05.123400",
                  sampling_rate=fs)
    return Trace(data, stats)


class TestRoundtrip:
    def test_steim1_roundtrip_exact(self):
        tr = make_trace()
        payload = mseed.encode_mseed(tr, reclen=512)
        assert len(payload) % 512 == 0
        back = mseed.read_mseed_bytes(payload)
        assert len(back) == 1
        b = back[0]
        assert b.id == tr.id
        assert b.stats.sampling_rate == tr.stats.sampling_rate
        assert abs(b.stats.starttime - tr.stats.starttime) < 1e-3
        np.testing.assert_array_equal(b.data, tr.data)

    def test_large_dynamic_range(self):
        # force 8/16/32-bit difference packings
        tr = make_trace(n=5000, amp=1.0)
        tr.data = tr.data.astype(np.int32)
        tr.data[::100] += 1_000_000  # big jumps -> 32-bit diffs
        payload = mseed.encode_mseed(tr)
        back = mseed.read_mseed_bytes(payload)
        np.testing.assert_array_equal(back[0].data, tr.data)

    def test_multi_record_file(self, tmp_path):
        tr = make_trace(n=100_000)
        path = str(tmp_path / "day.mseed")
        mseed.write_mseed(path, tr, reclen=4096)
        back = mseed.read_mseed(path)
        assert len(back) == 1  # contiguous records merged
        np.testing.assert_array_equal(back[0].data, tr.data)

    def test_constant_signal(self):
        tr = make_trace(n=3000, amp=0.0)
        tr.data = np.full(3000, 42, dtype=np.int32)
        back = mseed.read_mseed_bytes(mseed.encode_mseed(tr))
        np.testing.assert_array_equal(back[0].data, tr.data)


class TestAgainstReferenceDecoder:
    """Cross-check the C++ Steim decoding against an independent numpy
    implementation of the Steim1 spec."""

    def _np_decode_steim1(self, payload):
        # parse the first record's data section with plain numpy
        reclen = 512
        rec = np.frombuffer(payload[:reclen], dtype=np.uint8)
        data_off = int.from_bytes(rec[44:46], "big")
        nsamp = int.from_bytes(rec[30:32], "big")
        frames = rec[data_off:].reshape(-1, 64)
        diffs = []
        x0 = xn = None
        for fi, frame in enumerate(frames):
            ctrl = int.from_bytes(frame[:4], "big")
            for w in range(1, 16):
                c = (ctrl >> (2 * (15 - w))) & 3
                word = frame[4 * w: 4 * w + 4]
                if fi == 0 and w == 1:
                    x0 = int.from_bytes(word, "big", signed=True)
                    continue
                if fi == 0 and w == 2:
                    xn = int.from_bytes(word, "big", signed=True)
                    continue
                if c == 0:
                    continue
                if c == 1:
                    diffs.extend(np.frombuffer(word, dtype=np.int8))
                elif c == 2:
                    diffs.extend(np.frombuffer(word, dtype=">i2"))
                else:
                    diffs.append(int.from_bytes(word, "big", signed=True))
        out = np.empty(min(len(diffs), nsamp), dtype=np.int64)
        out[0] = x0
        for i in range(1, out.size):
            out[i] = out[i - 1] + diffs[i]
        assert out[-1] == xn or out.size < nsamp
        return out

    def test_first_record_matches_numpy_reference(self):
        tr = make_trace(n=400)
        payload = mseed.encode_mseed(tr, reclen=512)
        ref = self._np_decode_steim1(payload)
        got = mseed.read_mseed_bytes(payload)[0].data
        np.testing.assert_array_equal(got[:ref.size], ref)


class TestSDSMseed:
    def test_sds_archive_mseed_roundtrip(self, tmp_path):
        """SDS tree with miniSEED day files, read back through the
        archive's format sniffing (magic bytes)."""
        from xcorr_tpu.stream.sds import SDSArchive
        from xcorr_tpu.stream import Stream
        root = str(tmp_path / "sds")
        archive = SDSArchive(root, format="mseed")
        tr = make_trace(n=50_000)
        archive.write(Stream([tr]))
        back = archive.read(tr.id, tr.stats.starttime.datetime)
        assert len(back) == 1
        np.testing.assert_array_equal(back[0].data, tr.data)
        # and the waterfall Client finds it
        from xcorr_tpu.stream import Client
        client = Client(sds_root=root)
        st = client.get_waveforms(
            receiver=tr.id, time="2014-01-02T03:12:00", centered=True,
            duration=600.0, buffer=30.0, download=False)
        assert len(st) == 1
        assert st[0].stats.npts > 600 * 50


class TestCodecFuzz:
    """Property-style fuzzing of the Steim1 round trip."""

    @pytest.mark.parametrize("seed", range(6))
    def test_random_signals_roundtrip(self, seed):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(50, 20_000))
        kind = seed % 3
        if kind == 0:  # small diffs (8-bit packing)
            data = np.cumsum(rng.integers(-50, 50, n)).astype(np.int32)
        elif kind == 1:  # large dynamic range (32-bit escapes)
            data = rng.integers(-2**28, 2**28, n).astype(np.int32)
        else:  # mixed with long constant runs
            data = np.repeat(rng.integers(-1000, 1000, max(n // 17, 1)),
                             17)[:n].astype(np.int32)
        tr = make_trace(n=1)
        tr.data = data
        tr.stats.npts = n
        reclen = int(rng.choice([256, 512, 1024, 4096]))
        payload = mseed.encode_mseed(tr, reclen=reclen)
        assert len(payload) % reclen == 0
        back = mseed.read_mseed_bytes(payload)
        merged = np.concatenate([b.data for b in back])
        np.testing.assert_array_equal(merged, data)

    def test_extreme_values(self):
        data = np.array([0, 2**30, -2**30, 1, -1, 2**30 - 1],
                        dtype=np.int32)
        tr = make_trace(n=1)
        tr.data = data
        tr.stats.npts = data.size
        back = mseed.read_mseed_bytes(mseed.encode_mseed(tr, reclen=256))
        np.testing.assert_array_equal(back[0].data, data)

    @pytest.mark.parametrize("case", ["empty", "garbage", "truncated",
                                      "short_header", "bad_blockette",
                                      "bad_reclen_exp", "data_off_past_end"])
    def test_scan_survives_corrupt_input(self, case):
        """xcm_scan must never crash or over-report on malformed buffers
        — the availability probe treats scan failure as advisory and
        falls back to the decoding path."""
        tr = make_trace(n=3000)
        good = mseed.encode_mseed(tr, reclen=512)
        if case == "empty":
            payload = b""
        elif case == "garbage":
            payload = bytes(np.random.default_rng(3).integers(
                0, 256, 4096, dtype=np.uint8))
        elif case == "truncated":
            payload = good[: len(good) - 300]  # mid-record cut
        elif case == "short_header":
            payload = good[:40]
        elif case == "bad_blockette":  # chain pointing past the buffer
            buf = bytearray(good[:512])
            buf[46:48] = (60_000).to_bytes(2, "big")  # blockette offset
            payload = bytes(buf)
        elif case == "bad_reclen_exp":
            # blockette-1000 record-length exponent 31: 1<<31 must not
            # walk the scan/decode off the buffer (regression: UB /
            # negative reclen passed the bounds check)
            buf = bytearray(good)
            buf[54] = 31
            payload = bytes(buf)
        else:  # data offset >= reclen: no payload; scan must not count
            buf = bytearray(good[:512])
            buf[44:46] = (512).to_bytes(2, "big")
            payload = bytes(buf)
        segs = mseed.scan_mseed_bytes(payload)
        dec = mseed.read_mseed_bytes(payload)
        # scan coverage never exceeds decode coverage
        assert sum(s[2] for s in segs) <= sum(t.stats.npts for t in dec)

    def test_scan_matches_decode(self):
        """Header-only scan (xcm_scan): per-record ids/starttimes/rates
        and the total sample count must match the full decode across
        record lengths."""
        rng = np.random.default_rng(11)
        for reclen in (256, 512, 4096):
            n = int(rng.integers(1000, 30000))
            tr = make_trace(n=1)
            tr.data = rng.integers(-10000, 10000, n).astype(np.int32)
            tr.stats.npts = n
            payload = mseed.encode_mseed(tr, reclen=reclen)
            segs = mseed.scan_mseed_bytes(payload)
            dec = mseed.read_mseed_bytes(payload)
            assert sum(s[2] for s in segs) == \
                sum(t.stats.npts for t in dec) == n
            assert all(s[0] == tr.id for s in segs)
            assert all(s[3] == tr.stats.sampling_rate for s in segs)
            # record starttimes advance by npts/rate (contiguous file)
            for (_, t0, np0, r0), (_, t1, _, _) in zip(segs, segs[1:]):
                assert abs((t1 - t0) - np0 / r0) < 1e-4
