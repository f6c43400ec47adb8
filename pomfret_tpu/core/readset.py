"""Per-gap read window loading (load_reads_given_interval,
blockjoin.c:1043-1173).

Loads reads overlapping [itvl_s - readback, itvl_e + readback], decodes their
5mC calls, classifies boundary ("ref") reads on both sides of the gap, and
prepares the end-sorted ordering used by backward extension.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from ..io.bam import BamReader, bam_endpos
from ..io.basemod import read_meth_calls
from ..utils.log import log_warn
from .variants import HAPTAG_UNPHASED

READBACK = 50000      # blockjoin.c:19
MIN_ALN_DE = 0.1      # blockjoin.c:23
UINT32_MAX = 0xFFFFFFFF


@dataclass
class MmrConfig:
    """mmr_config_t (blockjoin.h:7-16). Defaults mirror cli.c:48-74."""
    k: int = 3
    k_span: int = 5000
    lo: int = 100
    hi: int = 156
    cov_known: int = -1
    cov_for_selection: int = -1
    cov_for_runtime: int = -2
    readlen_threshold: int = 15000
    min_mapq: int = 10


@dataclass
class Read:
    i: int
    qname: str
    hp: int
    strand: int
    length: int
    start_pos: int
    end_pos: int
    calls: np.ndarray          # uint32 ref positions (ascending by emit order)
    quals: np.ndarray          # uint8 classes 0=meth 1=unmeth 2=nocall
    # methmer storage (filled by store_mmr_of_reads)
    mmr: Optional[np.ndarray] = None
    mmr_n: int = 0
    mmr_start_i: int = UINT32_MAX


@dataclass
class ReadSet:
    ref_start: int
    ref_end: int
    reads: List[Read] = field(default_factory=list)
    ids_left: List[int] = field(default_factory=list)
    ids_left_strict: List[int] = field(default_factory=list)
    ids_right: List[int] = field(default_factory=list)
    ids_right_strict: List[int] = field(default_factory=list)
    rev_order: List[int] = field(default_factory=list)  # read IDs sorted by (end, id)
    has_mmr: bool = False
    # memoized derived arrays (reads' calls/quals never change after load):
    # concat_calls() result, and the per-cov methmer site selection
    _calls_concat: Optional[tuple] = field(default=None, repr=False)
    _site_sel_cache: Optional[tuple] = field(default=None, repr=False)

    @property
    def n(self) -> int:
        return len(self.reads)

    def concat_calls(self) -> tuple:
        """(calls, quals, call_off, call_n) concatenated over all reads,
        computed once per window (both methmer directions and the site
        selection consume the identical concatenation)."""
        if self._calls_concat is None:
            calls = np.concatenate([r.calls for r in self.reads]) if self.reads \
                else np.zeros(0, dtype=np.uint32)
            quals = np.concatenate([r.quals for r in self.reads]) if self.reads \
                else np.zeros(0, dtype=np.uint8)
            call_n = np.asarray([len(r.calls) for r in self.reads],
                                dtype=np.int32)
            call_off = np.zeros(self.n, dtype=np.int64)
            if self.n:
                np.cumsum(call_n[:-1], out=call_off[1:])
            self._calls_concat = (calls, quals, call_off, call_n)
        return self._calls_concat

    def store_haplotags(self) -> np.ndarray:
        # uint8 snapshot (store_haplotags, blockjoin.c:518-526)
        return np.array([r.hp & 0xFF for r in self.reads], dtype=np.uint8)

    def restore_haplotags(self, tags: np.ndarray) -> None:
        for r, t in zip(self.reads, tags):
            r.hp = int(t)

    def set_all_as_unphased(self) -> None:
        for r in self.reads:
            r.hp = 2


_HP_ABSENT = -(2 ** 31)  # native bam_window_load's "no HP tag" sentinel


class _WindowBuilder:
    """Shared per-window ReadSet assembly: dup check, HP semantics
    (get_hp_from_aln, blockjoin.c:910-923), raw-tag override, boundary
    classification, end-sorted ordering and the left-coverage gate
    (blockjoin.c:1127-1163). Used by both the per-window loader and the
    whole-chromosome columnar source so their semantics cannot drift."""

    def __init__(self, itvl_s: int, itvl_e: int,
                 qname2haptag_raw: Optional[Dict[str, int]]):
        self.rs = ReadSet(ref_start=max(itvl_s, 0), ref_end=itvl_e)
        self.itvl_s = itvl_s
        self.itvl_e = itvl_e
        self.q2h = qname2haptag_raw
        self.left_cov = [0, 0]
        self.seen = set()

    def add_read(self, qname, hp_tag, start_pos, strand, length, end_pos,
                 calls, quals) -> None:
        if qname in self.seen:
            raise ValueError(f"duplicated read name seen from reading bam: {qname}")
        self.seen.add(qname)
        if hp_tag is None:
            hp = HAPTAG_UNPHASED
        elif hp_tag == 0:
            log_warn("get_hp_from_aln", f"irregular HP tag? qn={qname} qs={start_pos}")
            hp = HAPTAG_UNPHASED
        else:
            hp = hp_tag - 1
        if self.q2h is not None:
            hp = self.q2h.get(qname, HAPTAG_UNPHASED)
        rs = self.rs
        rid = rs.n
        rs.reads.append(Read(
            i=rid, qname=qname, hp=hp, strand=strand,
            length=length, start_pos=start_pos, end_pos=end_pos,
            calls=calls, quals=quals,
        ))
        if start_pos <= self.itvl_s:
            rs.ids_left.append(rid)
            if end_pos > self.itvl_s:
                rs.ids_left_strict.append(rid)
            if hp in (0, 1):
                self.left_cov[hp] += 1
        elif end_pos >= self.itvl_e:
            rs.ids_right.append(rid)
            if start_pos < self.itvl_e:
                rs.ids_right_strict.append(rid)

    def finish(self) -> ReadSet:
        rs = self.rs
        rs.rev_order = sorted(range(rs.n),
                              key=lambda i: (rs.reads[i].end_pos, i))
        # left-side haplotype coverage gate (blockjoin.c:1161-1163)
        if self.left_cov[0] < 15 or self.left_cov[1] < 15:
            rs.reads = []
            rs.ids_left = []
            rs.ids_left_strict = []
            rs.ids_right = []
            rs.ids_right_strict = []
            rs.rev_order = []
        return rs


def load_reads_given_interval(
    bam: BamReader,
    chrom: str,
    itvl_s: int,
    itvl_e: int,
    readback: int,
    config: MmrConfig,
    qname2haptag_raw: Optional[Dict[str, int]] = None,
) -> ReadSet:
    wb = _WindowBuilder(itvl_s, itvl_e, qname2haptag_raw)
    rs = wb.rs
    lo1 = itvl_s - readback if itvl_s - readback > 0 else 0
    add_read = wb.add_read

    cols = buf = None
    fwc = getattr(bam, "fetch_window_columnar", None)
    if fwc is not None and not os.environ.get("POMFRET_NO_NATIVE_WINDOW"):
        cols, buf = fwc(chrom, max(0, lo1 - 1), itvl_e + readback,
                        config.min_mapq, config.readlen_threshold,
                        MIN_ALN_DE, config.lo, config.hi)
    if cols is not None:
        # native fast path: one C++ call decoded the window; only reads the
        # single-'C+m' decoder can't handle come back for the Python oracle
        if cols["has_implicit"]:
            from ..utils.log import set_data_has_implicit
            set_data_has_implicit()
        from ..io.bam import decode_record
        call_off = cols["call_off"] if cols["n"] else None
        for j in range(cols["n"]):
            if cols["fallback"][j]:
                # fallback reads are rare: slice just this record's bytes
                # (4-byte block_size prefix + body) instead of copying the
                # whole multi-MB window buffer per window
                off = int(cols["rec_off"][j])
                if isinstance(buf, bytes):
                    bs = int.from_bytes(buf[off : off + 4], "little")
                    rec_bytes = buf[off : off + 4 + bs]
                else:
                    bs = int.from_bytes(buf[off : off + 4].tobytes(), "little")
                    rec_bytes = buf[off : off + 4 + bs].tobytes()
                rec, _ = decode_record(rec_bytes, 0)
                calls_l, quals_l, has_implicit = read_meth_calls(
                    rec, config.lo, config.hi)
                if has_implicit:
                    from ..utils.log import set_data_has_implicit
                    set_data_has_implicit()
                if not calls_l:
                    continue
                calls = np.asarray(calls_l, dtype=np.uint32)
                quals = np.asarray(quals_l, dtype=np.uint8)
            else:
                o = int(call_off[j])
                cn = int(cols["call_n"][j])
                calls = cols["calls"][o : o + cn].copy()
                quals = cols["quals"][o : o + cn].copy()
            hp_raw = int(cols["hp"][j])
            add_read(cols["qnames"][j],
                     None if hp_raw == _HP_ABSENT else hp_raw,
                     int(cols["pos"][j]), int(cols["strand"][j]),
                     int(cols["l_seq"][j]), int(cols["endpos"][j]),
                     calls, quals)
    else:
        for rec in bam.fetch_region_1based(chrom, lo1, itvl_e + readback):
            if rec.flag & (4 | 256 | 2048):
                continue
            if rec.mapq < config.min_mapq:
                continue
            if rec.l_seq < 2 or rec.l_seq < config.readlen_threshold:
                continue
            de = rec.get_tag("de")
            if de is not None and de > MIN_ALN_DE:
                continue
            calls, quals, has_implicit = read_meth_calls(rec, config.lo, config.hi)
            if has_implicit:
                from ..utils.log import set_data_has_implicit
                set_data_has_implicit()
            if not calls:
                continue
            add_read(rec.qname, rec.get_tag("HP"), rec.pos,
                     1 if rec.is_reverse else 0, rec.l_seq, bam_endpos(rec),
                     np.asarray(calls, dtype=np.uint32),
                     np.asarray(quals, dtype=np.uint8))

    return wb.finish()


class ChromReadSource:
    """Whole-chromosome columnar read store, sliced into gap windows.

    The per-window loader re-decodes every read that falls in more than one
    ±READBACK halo (~1.4x the records on a WGS-like gap spacing) and pays a
    native-call + allocation round trip per window. This source decodes each
    record ONCE — segment by segment, so the decompressed buffer never
    exceeds one segment — into columnar arrays (pos/endpos/strand/hp/l_seq/
    qname + concatenated calls/quals), then materializes any window by
    binary search. Filters, overlap predicate (pos < end and endpos > beg,
    bam_window_load), HP semantics and boundary classification are shared
    with load_reads_given_interval via _WindowBuilder, so windows are
    read-for-read identical (asserted by tests/test_window_native.py).

    Only usable when the native columnar loader is available; callers fall
    back to per-window loads otherwise (ok == False).
    """

    def __init__(self, bam: BamReader, chrom: str, config: MmrConfig,
                 seg_len: int = 0):
        self.ok = False
        self.chrom = chrom
        if seg_len <= 0:
            # Small genomic tiles keep each plain-BAM span (and the native
            # call's scratch) to tens of MB, so consecutive tiles recycle
            # the same heap pages (utils/malloc_tune.py) instead of first-
            # touching a whole-chromosome span — on the virtualized hosts
            # new-page faults cost ~100x warm ones, so peak footprint, not
            # inflate throughput, dominated this scan at seg_len=8M.
            seg_len = int(os.environ.get("POMFRET_CHROM_SEG_LEN",
                                         1_000_000))
        fwc = getattr(bam, "fetch_window_columnar", None)
        if fwc is None or os.environ.get("POMFRET_NO_NATIVE_WINDOW") \
                or os.environ.get("POMFRET_NO_CHROM_SCAN"):
            return
        tid = bam.ref_id(chrom)
        if tid < 0:
            # unknown chromosome: every window is legitimately empty
            self.pos = np.zeros(0, dtype=np.int64)
            self.ok = True
            self._empty_init()
            return
        ref_len = bam.ref_lens[tid]
        from ..io.bam import decode_record
        from .variants import HAPTAG_UNPHASED as _HU

        pos_l, end_l, strand_l, hp_l, lseq_l = [], [], [], [], []
        qn_l = []
        calls_l, quals_l = [], []
        g0 = 0
        while g0 < ref_len:
            g1 = min(g0 + seg_len, ref_len)
            cols, buf = fwc(chrom, g0, g1, config.min_mapq,
                            config.readlen_threshold, MIN_ALN_DE,
                            config.lo, config.hi)
            if cols is None:
                return  # native path unavailable mid-way: stay not-ok
            if cols["has_implicit"]:
                from ..utils.log import set_data_has_implicit
                set_data_has_implicit()
            call_off = cols["call_off"] if cols["n"] else None
            for j in range(cols["n"]):
                p = int(cols["pos"][j])
                if p < g0:
                    continue  # decoded by the segment containing its start
                if cols["fallback"][j]:
                    off = int(cols["rec_off"][j])
                    if isinstance(buf, bytes):
                        bs = int.from_bytes(buf[off:off + 4], "little")
                        rb = buf[off:off + 4 + bs]
                    else:
                        bs = int.from_bytes(buf[off:off + 4].tobytes(),
                                            "little")
                        rb = buf[off:off + 4 + bs].tobytes()
                    rec, _ = decode_record(rb, 0)
                    cl, ql, has_implicit = read_meth_calls(
                        rec, config.lo, config.hi)
                    if has_implicit:
                        from ..utils.log import set_data_has_implicit
                        set_data_has_implicit()
                    if not cl:
                        continue
                    calls = np.asarray(cl, dtype=np.uint32)
                    quals = np.asarray(ql, dtype=np.uint8)
                else:
                    o = int(call_off[j])
                    cn = int(cols["call_n"][j])
                    calls = cols["calls"][o:o + cn].copy()
                    quals = cols["quals"][o:o + cn].copy()
                pos_l.append(p)
                end_l.append(int(cols["endpos"][j]))
                strand_l.append(int(cols["strand"][j]))
                hp_l.append(int(cols["hp"][j]))
                lseq_l.append(int(cols["l_seq"][j]))
                qn_l.append(cols["qnames"][j])
                calls_l.append(calls)
                quals_l.append(quals)
            g0 = g1

        self.pos = np.asarray(pos_l, dtype=np.int64)
        self.end = np.asarray(end_l, dtype=np.int64)
        self.strand = strand_l
        self.hp = hp_l
        self.lseq = lseq_l
        self.qnames = qn_l
        self.calls = calls_l
        self.quals = quals_l
        self.max_span = int((self.end - self.pos).max()) if len(pos_l) else 1
        self._hp_absent = _HP_ABSENT
        self.ok = True

    def _empty_init(self):
        self.end = np.zeros(0, dtype=np.int64)
        self.strand = []
        self.hp = []
        self.lseq = []
        self.qnames = []
        self.calls = []
        self.quals = []
        self.max_span = 1
        self._hp_absent = _HP_ABSENT

    def window(self, itvl_s: int, itvl_e: int, readback: int,
               qname2haptag_raw: Optional[Dict[str, int]] = None) -> ReadSet:
        """ReadSet for one gap window — identical to
        load_reads_given_interval(bam, chrom, itvl_s, itvl_e, readback, ...)."""
        wb = _WindowBuilder(itvl_s, itvl_e, qname2haptag_raw)
        lo1 = itvl_s - readback if itvl_s - readback > 0 else 0
        beg = max(0, lo1 - 1)
        end = itvl_e + readback
        lo_i = int(np.searchsorted(self.pos, beg - self.max_span, side="left"))
        hi_i = int(np.searchsorted(self.pos, end, side="left"))
        add_read = wb.add_read
        for j in range(lo_i, hi_i):
            if self.end[j] <= beg:
                continue
            hp_raw = self.hp[j]
            add_read(self.qnames[j],
                     None if hp_raw == self._hp_absent else hp_raw,
                     int(self.pos[j]), self.strand[j], self.lseq[j],
                     int(self.end[j]), self.calls[j], self.quals[j])
        return wb.finish()
