r"""
:mod:`stream.client` -- Waterfall waveform client
=================================================

Waveform getter with the reference's waterfall semantics
(``xcorr/stream/client.py:58-1507``): scan local SDS archives for the
exact period, fall back to per-day remote fetch (FDSN web service) with
automatic archiving to the SDS write root, preprocess through the hashed
ops DSL, and enforce strict sampling-rate/sample-count checks.

:class:`SyntheticClient` replaces the remote edge with deterministic
synthetic waveforms (seeded per receiver/day, with a shared source wavelet
injected at configurable per-receiver delays) — the hermetic test backend
the reference never had (SURVEY.md §4).
"""

from __future__ import annotations

import warnings
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pandas as pd

from ..ndlabel import DataArray
from ..util.receiver import check_receiver, split_pair
from ..util.time import get_dates, to_datetime
from . import process as stream_process
from .sds import SDSArchive
from .trace import Stream, Stats, Trace, UTCDateTime

__all__ = ["Client", "SyntheticClient"]


class Client:
    """Waterfall waveform client over local SDS archives (+ optional
    remote fetch hook)."""

    def __init__(self, sds_root: str = None, sds_root_write: str = None,
                 sds_root_read=None, fdsn_base_url: str = None,
                 vdms_request=None, vdms_transport=None,
                 parallel: bool = False,
                 max_gap: float = 300.0, force_write: bool = False,
                 scan_availability: bool = True,
                 verb: int = 0, **kwargs):
        if not (sds_root or sds_root_read or sds_root_write):
            if not isinstance(self, SyntheticClient):
                raise AttributeError(
                    "At least one of sds_root, sds_root_read or "
                    "sds_root_write is required.")
        self.sds_root_write = sds_root_write or sds_root
        roots = (sds_root_read if sds_root_read is not None
                 else ([sds_root] if sds_root else []))
        if isinstance(roots, str):
            roots = [roots]
        self.sds_root_read = list(roots)
        if self.sds_root_write and \
                self.sds_root_write not in self.sds_root_read:
            self.sds_root_read.append(self.sds_root_write)
        self.archives = [SDSArchive(r) for r in self.sds_root_read]
        self.write_archive = (SDSArchive(self.sds_root_write)
                              if self.sds_root_write else None)
        self.fdsn_base_url = fdsn_base_url
        from .vdms import VDMSClient
        self.vdms = VDMSClient(vdms_request, transport=vdms_transport)
        self.parallel = parallel
        self.max_gap = max_gap
        self.force_write = force_write
        self.scan_availability = scan_availability
        self.verb = verb

    # -- day-stream quality gating ---------------------------------------------

    def __str__(self):
        """Formatted client overview (reference
        ``xcorr/stream/client.py:182-198``)."""
        rows = [("sds read", self.sds_root_read),
                ("sds write", self.sds_root_write),
                ("fdsn", "Yes" if self.fdsn_base_url else "No")]
        if self.fdsn_base_url:
            rows.append(("fdsn base url", self.fdsn_base_url))
        rows.append(("vdms", "Yes" if self.vdms.available() else "No"))
        rows += [("max gap", f"{self.max_gap}s"),
                 ("force write", "Yes" if self.force_write else "No"),
                 ("parallel", "Yes" if self.parallel else "No")]
        width = max(len(k) for k, _ in rows)
        return "\n".join(f"{k:>{width}} : {v}" for k, v in rows)

    def check_duration(self, stream, duration: float = None,
                       receiver: str = None, verb: int = 0,
                       **kwargs) -> bool:
        """Whether ``stream`` covers at least ``duration`` − ``max_gap``
        seconds of data (``xcorr/stream/client.py:369-423``); extra
        kwargs (e.g. ``sampling_rate``) filter the underlying
        :func:`~xcorr_tpu.stream.duration.duration` scan."""
        from .duration import duration as stream_duration
        if stream is None or not len(stream):
            return False
        duration = duration or 86400.0
        d = stream_duration(stream, receiver, **kwargs)
        if len(d) == 0:
            return False
        time = float(d["time"].iloc[0])
        passed = time >= duration - self.max_gap
        if verb > 2:
            print(f"Time: {time}s, max gap: {self.max_gap}s, "
                  f"passed: {passed}")
        return passed

    def _sds_write_daystream(self, stream, force_write: bool = None,
                             verb: int = 0) -> bool:
        """Archive a downloaded day stream after the ``max_gap`` duration
        gate (``xcorr/stream/client.py:270-367``): streams with more than
        ``max_gap`` cumulative seconds missing are rejected (not archived,
        not returned to the caller) unless ``force_write``."""
        force_write = self.force_write if force_write is None \
            else force_write
        passed = self.check_duration(stream, verb=verb)
        if not passed and not force_write:
            return False
        success = True
        if self.write_archive is not None:
            try:
                self.write_archive.write(stream, verb=verb)
            except (KeyboardInterrupt, SystemExit):
                raise
            except Exception as error:
                success = False
                if verb > 0:
                    print(f"Intercepted error @ sds write daystream: "
                          f"{error}")
        return passed and success

    # -- raw waveform access -------------------------------------------------

    def _get_sds_waveforms(self, receiver: str, start, end, duration,
                           verb: int = 0):
        """Scan all read roots for the receiver covering [start, end]."""
        for archive in self.archives:
            traces = []
            for day in get_dates(start, end):
                st = archive.read(receiver, day)
                traces.extend(st.traces)
            if not traces:
                continue
            st = Stream(traces).merge(method=1, fill_value="interpolate")
            st.trim(start, end)
            if len(st) and st[0].stats.npts > 0:
                got = st[0].stats.endtime - st[0].stats.starttime
                if got >= duration - 2.0 / st[0].stats.sampling_rate:
                    return st
        return Stream()

    def _get_waveforms_for_date(self, receiver: str, date, download=True,
                                verb: int = 0):
        """One calendar day: SDS scan -> remote fetch (archived on
        success)."""
        net, sta, loc, cha = receiver.split(".")
        for archive in self.archives:
            st = archive.read(receiver, date)
            if len(st):
                return st
        if download:
            # waterfall tier 2: FDSN web service. A fetched day failing
            # the max_gap duration gate is dropped (falls through to the
            # next tier), matching xcorr/stream/client.py:736-741.
            st = self._remote_fetch(receiver, date, verb=verb)
            if st and len(st) and self._sds_write_daystream(st, verb=verb):
                return st
            # waterfall tier 3: VDMS (CTBTO IMS), when configured. A
            # raising user transport degrades to an empty stream (the
            # day is marked missing) instead of aborting the whole span
            # fetch, matching xcorr/stream/client.py:775-789.
            if self.vdms.available():
                try:
                    st = self.vdms.get_waveforms(receiver, date, verb=verb)
                except (KeyboardInterrupt, SystemExit):
                    raise
                except Exception as error:
                    warnings.warn(f"VDMS fetch failed for {receiver} "
                                  f"{date}: {error}", UserWarning)
                    st = Stream()
                if st and len(st) and \
                        self._sds_write_daystream(st, verb=verb):
                    return st
        return Stream()

    def _scan_availability_flag(self, receiver: str, date):
        """Header-only availability probe against the SDS archives.

        Mirrors the slow path exactly: when a day file exists,
        ``_get_waveforms_for_date`` returns its stream WITHOUT trying
        remote tiers and ``check_duration`` sums the first SEED id's
        ``npts/rate`` — so segments present here decide the flag
        (1/-1) from header sample counts alone, and no segments means
        "fall through to the full fetch path" (``None``). Scan errors
        (corrupt file, native codec unavailable) also return ``None``
        so the decoding path keeps the final word. Advisory by design:
        a payload that decodes short of its header count is caught
        later by the processing path's own gap handling.
        """
        try:
            for archive in self.archives:
                segs = archive.coverage(receiver, date)
                if not segs:
                    continue
                per_id = {}
                for seed_id, _t, npts, rate in segs:
                    if npts > 0 and rate > 0:
                        per_id.setdefault(seed_id, []).append(npts / rate)
                if not per_id:
                    return -1
                time = sum(next(iter(per_id.values())))
                return 1 if time >= 86400.0 - self.max_gap else -1
        except (KeyboardInterrupt, SystemExit):
            raise
        except Exception:
            return None
        return None

    def _test_waveforms_for_date(self, receiver: str, date,
                                 download: bool = False,
                                 verb: int = 0) -> int:
        """Availability probe for one (receiver, day): 1 = full day
        available (within ``max_gap``), -1 = missing/partial, -2 = the
        fetch itself errored (``xcorr/stream/client.py:794-835``).

        With ``scan_availability`` (default), archived days resolve
        from a header-only coverage scan (:meth:`SDSArchive.coverage`)
        — no Steim decode per (receiver, day); days absent from the
        archives still take the full fetch waterfall (and archive what
        they download)."""
        if self.scan_availability:
            flag = self._scan_availability_flag(receiver, date)
            if flag is not None:
                return flag
        try:
            st = self._get_waveforms_for_date(receiver, date,
                                              download=download, verb=verb)
        except (KeyboardInterrupt, SystemExit):
            raise
        except Exception as error:
            if verb > 0:
                print(f"Intercepted error @ get_waveforms_for_date: "
                      f"{error}")
            return -2
        return 1 if self.check_duration(st, duration=86400.0,
                                        verb=verb) else -1

    def _remote_fetch(self, receiver: str, date, verb: int = 0):
        """Remote day fetch hook (FDSN dataselect). Gated: returns an
        empty stream when no base url is configured or the service is
        unreachable."""
        if not self.fdsn_base_url:
            return Stream()
        try:
            from .fdsn import fdsn_dataselect
            return fdsn_dataselect(self.fdsn_base_url, receiver, date,
                                   verb=verb)
        except Exception as error:  # network failures must not kill a batch
            warnings.warn(f"FDSN fetch failed for {receiver} {date}: "
                          f"{error}", UserWarning)
            return Stream()

    def get_waveforms(self, receiver: str = None, time=None,
                      centered: bool = True, duration: float = 86400.0,
                      buffer: float = None, allow_wildcards: bool = False,
                      download: bool = True, verb: int = 0, network=None,
                      station=None, location=None, channel=None, **kwargs):
        """Windowed waveforms with a ±buffer (default 5% of duration),
        reference window arithmetic (``xcorr/stream/client.py:425-558``)."""
        if receiver is None:
            receiver = f"{network}.{station}.{location}.{channel}"
        check_receiver(receiver, allow_wildcards=allow_wildcards,
                       raise_error=True)
        time = to_datetime(time)
        buffer = duration * 0.05 if buffer is None else buffer
        if centered:
            t0 = time - pd.Timedelta(seconds=duration / 2 + buffer)
        else:
            t0 = time - pd.Timedelta(seconds=buffer)
        t1 = t0 + pd.Timedelta(seconds=duration + 2 * buffer)

        # 1. exact period from the local archives
        st = self._get_sds_waveforms(receiver, t0, t1,
                                     duration + 2 * buffer, verb=verb)
        if len(st):
            return st
        # 2. per-day fallback (optionally downloading/archiving)
        traces = []
        for day in get_dates(t0, t1):
            day_st = self._get_waveforms_for_date(receiver, day,
                                                  download=download,
                                                  verb=verb)
            traces.extend(day_st.traces)
        if not traces:
            return Stream()
        st = Stream(traces).merge(method=1, fill_value="interpolate")
        st.trim(t0, t1)
        return st

    # -- processed waveforms ---------------------------------------------------

    def get_processed_waveforms(self, receiver: str, time, operations: dict,
                                duration: float = 86400.0,
                                inventory=None, sampling_rate: float = None,
                                buffer: float = None, strict: bool = False,
                                centered: bool = True,
                                three_components: str = "12Z",
                                verb: int = 0, **kwargs):
        """Fetch + preprocess one receiver's window through its channel's
        op chain, with R/T 3-component substitution and strict sample
        checks (``xcorr/stream/client.py:851-1050``)."""
        check_receiver(receiver, raise_error=True)
        cha = receiver.split(".")[3]
        if cha not in operations:
            warnings.warn(f"No preprocess operations for channel {cha!r}",
                          UserWarning)
            return Stream()
        ops_list = operations[cha]
        buffer = duration * 0.05 if buffer is None else buffer

        # R/T rotated channels need all three raw components
        if cha[-1] in "RT":
            receivers = [receiver[:-1] + c for c in three_components]
        else:
            receivers = [receiver]
        st = Stream()
        for r in receivers:
            st += self.get_waveforms(receiver=r, time=time,
                                     centered=centered, duration=duration,
                                     buffer=buffer, verb=verb, **kwargs)
        if not len(st):
            return Stream()

        time = to_datetime(time)
        if centered:
            t0 = time - pd.Timedelta(seconds=duration / 2)
        else:
            t0 = time
        t1 = t0 + pd.Timedelta(seconds=duration)

        st = stream_process.process(
            st, ops_list, inventory=inventory, starttime=t0, endtime=t1,
            verb=verb - 1 if verb else 0, **kwargs)
        if st is None or not len(st):
            return Stream()
        st.trim(UTCDateTime(t0), UTCDateTime(t1) - 1.0 / (
            sampling_rate or st[0].stats.sampling_rate))

        # sampling rate check
        if sampling_rate is not None:
            for tr in st:
                if abs(tr.stats.sampling_rate - sampling_rate) > 1e-6:
                    warnings.warn(
                        f"Sampling rate of {tr.id} is "
                        f"{tr.stats.sampling_rate}, expected "
                        f"{sampling_rate}", UserWarning)
                    return Stream()
        # strict sample-count check
        if strict and sampling_rate is not None:
            want = int(duration * sampling_rate)
            for tr in st:
                if tr.stats.npts != want:
                    warnings.warn(
                        f"{tr.id} has {tr.stats.npts} samples, expected "
                        f"{want}", UserWarning)
                    return Stream()
        return st

    def get_pair_processed_waveforms(self, pair, time, operations: dict,
                                     **kwargs):
        """Both receivers' processed windows, concatenated
        (``xcorr/stream/client.py:1116-1149``)."""
        receivers = split_pair(pair)
        st = Stream()
        for receiver in receivers:
            st += self.get_processed_waveforms(receiver, time, operations,
                                               **kwargs)
        return st

    # -- availability / preprocessing verification ------------------------------

    def verify_waveform_availability(self, receivers, times,
                                     substitute: bool = True,
                                     three_components: str = "12Z",
                                     parallel: bool = None,
                                     download: bool = False, verb: int = 0,
                                     **kwargs):
        """(receiver, time) int8 status DataArray with the reference's
        4-state flags (``xcorr/stream/client.py:804-806,1151-1326``):
        1 = a full day present (within ``max_gap`` cumulative seconds
        missing), -1 = missing or partial, -2 = the probe errored,
        0 = not validated (never emitted by this eager scan; kept in the
        flag table for schema parity with incremental scans)."""
        rlist = []
        for r in receivers:
            # pair strings split on '-'; ``substitute`` additionally
            # expands R/T rotated channels into raw components
            for s in split_pair(r, substitute=substitute,
                                three_components=three_components):
                if s not in rlist:
                    rlist.append(s)
        times = pd.DatetimeIndex(np.asarray(times))

        def check(args):
            receiver, t = args
            return self._test_waveforms_for_date(receiver, t,
                                                 download=download, verb=0)

        items = [(r, t) for r in rlist for t in times]
        parallel = self.parallel if parallel is None else parallel
        if parallel:
            with ThreadPoolExecutor() as ex:
                flags = list(ex.map(check, items))
        else:
            flags = [check(i) for i in items]
        status = np.asarray(flags, dtype=np.int8).reshape(len(rlist),
                                                          len(times))
        out = DataArray(status, dims=("receiver", "time"),
                        coords={"receiver": np.asarray(rlist, dtype=object),
                                "time": times.values},
                        name="status",
                        attrs={"long_name": "Waveform availability status",
                               "valid_range": np.int8([-2, 1]),
                               "flag_values": np.int8([-2, -1, 0, 1]),
                               "flag_meanings":
                                   "failed missing not_validated "
                                   "available"})
        if verb > 0:
            avail = (status == 1).mean() * 100
            print(f"Availability: {avail:.1f}%")
        return out

    def verify_waveform_processing(self, receivers, time, operations: dict,
                                   inventory=None,
                                   sampling_rate: float = None,
                                   substitute: bool = False,
                                   parallel: bool = None, verb: int = 0,
                                   **kwargs):
        """Single-day preprocessing dry-run status per receiver
        (``xcorr/stream/client.py:1328-1507``)."""
        rlist = list(receivers)

        def check(receiver):
            try:
                st = self.get_processed_waveforms(
                    receiver, time, operations, inventory=inventory,
                    sampling_rate=sampling_rate, strict=True, verb=0,
                    **kwargs)
                return 1 if len(st) else -1
            except Exception:
                return -1

        parallel = self.parallel if parallel is None else parallel
        if parallel:
            with ThreadPoolExecutor() as ex:
                flags = list(ex.map(check, rlist))
        else:
            flags = [check(r) for r in rlist]
        out = DataArray(
            np.asarray(flags, dtype=np.int8)[:, None],
            dims=("receiver", "time"),
            coords={"receiver": np.asarray(rlist, dtype=object),
                    "time": np.asarray([to_datetime(time)
                                        .to_datetime64()])},
            name="status",
            attrs={"long_name": "Waveform processing status",
                   "flag_values": np.int8([-1, 1]),
                   "flag_meanings": "failed processed"})
        return out


class SyntheticClient(Client):
    """Deterministic synthetic waveform backend for tests and benchmarks.

    Every (receiver, day) produces reproducible band-limited noise; a
    shared source wavelet train is injected into every receiver with a
    per-receiver ``delays`` offset (seconds), so cross-correlations of
    receiver pairs peak at known lags.
    """

    def __init__(self, sampling_rate: float = 50.0, delays: dict = None,
                 noise_amplitude: float = 1.0, source_amplitude: float = 5.0,
                 source_period: float = 3600.0, seed: int = 908,
                 missing: set = None, **kwargs):
        super().__init__(**kwargs)
        self.sampling_rate = sampling_rate
        self.delays = delays or {}
        self.noise_amplitude = noise_amplitude
        self.source_amplitude = source_amplitude
        self.source_period = source_period
        self.seed = seed
        self.missing = missing or set()

    def _delay_of(self, receiver: str):
        if receiver in self.delays:
            return float(self.delays[receiver])
        sta = receiver.split(".")[1]
        return float(self.delays.get(sta, 0.0))

    def _get_waveforms_for_date(self, receiver: str, date, download=True,
                                verb: int = 0):
        """SDS-free by default; with archives configured (``sds_root``)
        the full production waterfall runs — archive read first, the
        synthesizer plays the remote tier, and fetched days archive
        through the ``max_gap`` gate — so campaigns exercise the real
        codec/scan read path on synthetic data."""
        if self.archives:
            return Client._get_waveforms_for_date(
                self, receiver, date, download=download, verb=verb)
        return self._synthesize_day(receiver, date)

    def _remote_fetch(self, receiver: str, date, verb: int = 0):
        # synthesis as the remote tier of the archive waterfall
        return self._synthesize_day(receiver, date)

    def _synthesize_day(self, receiver: str, date):
        date = to_datetime(date).normalize()
        key = (receiver, date.strftime("%Y%j"))
        if key in self.missing or receiver in self.missing:
            return Stream()
        fs = self.sampling_rate
        n = int(86400 * fs)
        rng = np.random.default_rng(
            _stable_seed(self.seed, receiver, date.strftime("%Y%j")))
        # float32 end to end: real archives carry int32 counts or f32
        # samples, and synthetic noise has no 53-bit content — f32 days
        # halve archive size, read time and merged-span memory (the
        # device pipeline is f32 anyway)
        data = np.float32(self.noise_amplitude) * \
            rng.standard_normal(n, dtype=np.float32)

        # shared source wavelet train: seeded by day only, delayed per
        # receiver; generated on a day grid so every receiver sees the
        # same source samples
        src_rng = np.random.default_rng(
            _stable_seed(self.seed, "src", date.strftime("%Y%j")))
        period_n = int(self.source_period * fs)
        wavelet = _ricker(int(2 * fs), 4.0, fs) * self.source_amplitude
        delay_n = int(round(self._delay_of(receiver) * fs))
        # onset draws must be identical for every receiver: the random
        # bound uses a fixed margin, never the receiver's own delay.
        # Short source periods can't honor the full 60 s edge guard —
        # shrink it so the draw range stays valid instead of raising.
        margin = int(60.0 * fs) + wavelet.size
        if period_n > wavelet.size and 2 * margin >= period_n:
            margin = max((period_n - wavelet.size) // 4, 1)
        for k in range(n // period_n if period_n > wavelet.size else 0):
            lo, hi = margin, period_n - margin
            onset = int(src_rng.integers(lo, hi)) if hi > lo \
                else period_n // 2
            i = k * period_n + onset + delay_n
            if 0 <= i and i + wavelet.size <= n:
                data[i:i + wavelet.size] += wavelet

        net, sta, loc, cha = receiver.split(".")
        stats = Stats(network=net, station=sta, location=loc, channel=cha,
                      starttime=date, sampling_rate=fs)
        return Stream([Trace(data, stats)])


def _stable_seed(*parts):
    """Process-independent 32-bit seed from arbitrary parts (Python's
    built-in ``hash`` is salted per process)."""
    import hashlib
    h = hashlib.sha256("|".join(str(p) for p in parts).encode())
    return int.from_bytes(h.digest()[:4], "little")


def _ricker(n: int, f0: float, fs: float):
    """Ricker wavelet of ``n`` samples at center frequency ``f0``."""
    t = (np.arange(n) - n // 2) / fs
    a = (np.pi * f0 * t) ** 2
    return (1 - 2 * a) * np.exp(-a)
