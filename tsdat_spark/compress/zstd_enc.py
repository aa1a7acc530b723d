"""Pure-Python Zstandard ENCODER — entropy-coded RFC 8878 frames.

Completes the from-spec zstd story started by :mod:`.zstd` (the decoder):
where round-5's ``zstd_compress`` emitted store-mode raw/RLE blocks only,
this module emits real Compressed blocks:

- LZ77 sequences from a two-probe hash match finder plus a rep-offset
  probe (numpy-vectorized rolling hash, chunked match extension, and an
  entropy-priced acceptance test so low-entropy alphabets are not drowned
  in short far matches); offsets may reach back across block boundaries
  (the frame window is the whole content, single-segment frame header),
  matches and literal runs capped at the RFC code-table maxima
  (131074 / 131071).
- literals: Raw / RLE / Huffman-compressed, 1-stream (regenerated <= 1023)
  and 4-stream with jump table; canonical prefix codes built by
  package-merge (optimal 11-bit-limited lengths, RFC 8878 §4.2.1), table
  serialized as direct 4-bit weights when the last used symbol is <= 128,
  else as FSE-compressed weights (two interleaved states, accuracy <= 6,
  §4.2.1.2) — every weight header is round-tripped through the in-repo
  decoder before being emitted, so the zero-bit-state pathological case
  degrades to the raw-literals fallback instead of a corrupt frame.
- sequences: the RFC's Predefined FSE distributions for LL/OF/ML (mode
  bits 0b00 — no table descriptions on the wire); encoding walks each
  state chain backward over the decode table's per-symbol interval
  tiling, then interleaves extra/update fields in exact decoder-read
  order into one backward bitstream.
- per block (<= 131071 bytes decoded) the cheapest of Raw / RLE /
  Compressed wins, so the encoder never expands beyond store mode + 3
  bytes/block.

Everything is validated two ways in ``tests/test_zstd_enc.py``: the
module's own decoder (bit-exact round trip) and the host ``zstd`` CLI
(libzstd accepts and regenerates every frame).

Performance shape: encoding runs inside Spark tasks (one chunk per task,
as with :mod:`.bloscc`); pure-Python throughput is ~1-3 MB/s per task —
fine for the chunk sizes zarr/HDF5 sinks emit, and the sinks that need
raw speed keep defaulting to gzip/blosc.
"""

from __future__ import annotations

import struct
from bisect import bisect_right

from .zstd import (
    _LL_BASE,
    _LL_DEFAULT,
    _ML_BASE,
    _ML_DEFAULT,
    _OF_DEFAULT,
    _fse_build_dtable,
    _huf_read_weights,
)

_MAGIC = 0xFD2FB528
_BLOCK_MAX = 131071  # <= 128 KiB and <= max literal-length code reach
_MAX_OFFSET = 1 << 27  # offset_value = offset+3 must stay in OF codes <= 28
_MAX_MATCH = 131074  # ML code 52 baseline 65539 + 16 extra bits
_HASH_LOG = 15
_HASH_MUL = 2654435761


# ------------------------------------------------------------ bit writers


class _BackWriter:
    """Builds the backward bitstream :class:`..zstd._BackBits` reads: fields
    are supplied in DECODER-READ order and written reversed (first-read
    field lands in the top bits, under the 1-bit sentinel)."""

    __slots__ = ("out", "acc", "n")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def _write(self, val: int, nbits: int) -> None:
        self.acc |= val << self.n
        self.n += nbits
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def pack(self, fields) -> bytes:
        for val, nbits in reversed(fields):
            self._write(val, nbits)
        self._write(1, 1)  # sentinel: highest set bit of the last byte
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc = self.n = 0
        return bytes(self.out)


class _FwdWriter:
    """LSB-first forward bitstream (FSE table descriptions only) — the
    mirror of :class:`..zstd._FwdBits`; the final partial byte zero-pads."""

    __slots__ = ("out", "acc", "n")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, val: int, nbits: int) -> None:
        self.acc |= val << self.n
        self.n += nbits
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def finish(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc = self.n = 0
        return bytes(self.out)


# ----------------------------------------------------------- FSE encoding


def _fse_normalize(freqs: dict[int, int], accuracy_log: int) -> list[int]:
    """Normalize symbol counts to sum exactly 2**accuracy_log, every
    present symbol >= 1 (the -1 "less than one" probability is never
    emitted — slightly suboptimal, unconditionally valid)."""
    size = 1 << accuracy_log
    total = sum(freqs.values())
    if len(freqs) > size:
        raise ValueError("zstd: more symbols than FSE states")
    norm = {s: max(1, (f * size) // total) for s, f in freqs.items()}
    diff = size - sum(norm.values())
    if diff > 0:  # give the surplus to the most frequent symbols
        for s, _ in sorted(freqs.items(), key=lambda kv: -kv[1]):
            norm[s] += diff
            break
    while diff < 0:  # shave the largest normalized counts
        s = max(norm, key=lambda k: norm[k])
        if norm[s] <= 1:
            raise ValueError("zstd: cannot normalize FSE distribution")
        take = min(norm[s] - 1, -diff)
        norm[s] -= take
        diff += take
    max_sym = max(norm)
    return [norm.get(s, 0) for s in range(max_sym + 1)]


def _fse_write_ncount(counts: list[int], accuracy_log: int) -> bytes:
    """Serialize normalized counts — the exact mirror of
    ``zstd._fse_read_ncount`` (variable-bit values, 2-bit zero-run
    repeats)."""
    w = _FwdWriter()
    w.write(accuracy_log - 5, 4)
    size = 1 << accuracy_log
    remaining = size + 1
    threshold = size
    nb_bits = accuracy_log + 1
    sym = 0
    while remaining > 1:
        p = counts[sym]
        sym += 1
        v = p + 1
        maxv = (2 * threshold - 1) - remaining
        if v < maxv:
            w.write(v, nb_bits - 1)
        elif v < threshold:
            w.write(v, nb_bits)
        else:
            w.write(v + maxv, nb_bits)
        remaining -= -p if p < 0 else p
        while remaining < threshold:
            nb_bits -= 1
            threshold >>= 1
        if p == 0 and remaining > 1:
            # run of zeros after a zero probability: 2-bit repeat flags
            run = 0
            while counts[sym + run] == 0:
                run += 1
            sym += run
            while run >= 3:
                w.write(3, 2)
                run -= 3
            w.write(run, 2)
    return w.finish()


class _FseEncoder:
    """Encode-side view of a decode table: per symbol, the sorted
    (baseline, state) intervals tile [0, table_size), so walking a state
    chain backward is one bisect per symbol."""

    __slots__ = ("nbs", "bases", "log", "by_sym")

    def __init__(self, counts: list[int], accuracy_log: int):
        syms, nbs, bases = _fse_build_dtable(counts, accuracy_log)
        self.nbs = nbs
        self.bases = bases
        self.log = accuracy_log
        by_sym: dict[int, list[tuple[int, int]]] = {}
        for st, s in enumerate(syms):
            by_sym.setdefault(s, []).append((bases[st], st))
        for lst in by_sym.values():
            lst.sort()
        self.by_sym = by_sym

    def chain(self, codes: list[int]) -> tuple[int, list[tuple[int, int]]]:
        """Walk a symbol chain backward. Returns (initial_state, updates)
        where updates[i] = (bits, nbits) the decoder reads AFTER emitting
        codes[i] (len(codes)-1 entries)."""
        state = self.by_sym[codes[-1]][0][1]  # any state emitting the last
        m = len(codes)
        updates: list[tuple[int, int]] = [(0, 0)] * (m - 1)
        for i in range(m - 2, -1, -1):
            lst = self.by_sym[codes[i]]
            j = bisect_right(lst, (state, 1 << 30)) - 1
            base, st = lst[j]
            updates[i] = (state - base, self.nbs[st])
            state = st
        return state, updates


_LL_ENC = _FseEncoder(*_LL_DEFAULT)
_ML_ENC = _FseEncoder(*_ML_DEFAULT)
_OF_ENC = _FseEncoder(*_OF_DEFAULT)

# code lookup: largest code whose baseline <= value
_LL_BASELINES = [b for b, _ in _LL_BASE]
_ML_BASELINES = [b for b, _ in _ML_BASE]


def _ll_code(v: int) -> tuple[int, int, int]:
    c = bisect_right(_LL_BASELINES, v) - 1
    base, extra = _LL_BASE[c]
    return c, v - base, extra


def _ml_code(v: int) -> tuple[int, int, int]:
    c = bisect_right(_ML_BASELINES, v) - 1
    base, extra = _ML_BASE[c]
    return c, v - base, extra


# -------------------------------------------------------- Huffman encoding


def _package_merge(freqs: dict[int, int], max_len: int) -> dict[int, int]:
    """Optimal length-limited prefix-code lengths (package-merge)."""
    n = len(freqs)
    singles = sorted(((f, (s,)) for s, f in freqs.items()),
                     key=lambda x: x[0])
    merged = list(singles)
    for _ in range(max_len - 1):
        paired = [(a[0] + b[0], a[1] + b[1])
                  for a, b in zip(merged[::2], merged[1::2])]
        merged = sorted(paired + singles, key=lambda x: x[0])
    lengths = {s: 0 for s in freqs}
    for _, syms in merged[: 2 * n - 2]:
        for s in syms:
            lengths[s] += 1
    return lengths


def _huf_build(freqs: dict[int, int]):
    """Code lengths -> (weights_full incl. implicit last, table_log,
    per-symbol (code, nbits)) matching ``zstd._huf_table_from_weights``'s
    cell fill (increasing weight, then symbol id)."""
    lengths = _package_merge(freqs, 11)
    table_log = max(lengths.values())
    max_sym = max(lengths)
    weights_full = [0] * (max_sym + 1)
    for s, nb in lengths.items():
        weights_full[s] = table_log + 1 - nb
    codes: list[tuple[int, int] | None] = [None] * 256
    pos = 0
    for w in range(1, table_log + 1):
        for s, ws in enumerate(weights_full):
            if ws == w:
                nb = table_log + 1 - w
                codes[s] = (pos >> (table_log - nb), nb)
                pos += 1 << (w - 1)
    return weights_full, table_log, codes


def _huf_write_weights(weights_full: list[int]) -> bytes | None:
    """Serialize the tree description (last weight implicit). Direct 4-bit
    weights when <= 128 are listed; else FSE-compressed, round-tripped
    through the in-repo reader (returns None on any pathology -> caller
    falls back to raw literals)."""
    explicit = weights_full[:-1]
    n = len(explicit)
    if n < 1:
        return None
    if n <= 128:
        out = bytearray([127 + n])
        for i in range(0, n, 2):
            hi = explicit[i] << 4
            lo = explicit[i + 1] if i + 1 < n else 0
            out.append(hi | lo)
        return bytes(out)
    # FSE-compressed weights: two interleaved states over one stream
    freqs: dict[int, int] = {}
    for wv in explicit:
        freqs[wv] = freqs.get(wv, 0) + 1
    if len(freqs) < 2:
        return None  # RLE-like weight stream: not expressible, fall back
    try:
        counts = _fse_normalize(freqs, 6)
        desc = _fse_write_ncount(counts, 6)
        enc = _FseEncoder(counts, 6)
    except ValueError:
        return None
    chain_a = explicit[0::2]  # emitted from state 1
    chain_b = explicit[1::2]  # emitted from state 2
    init_a, upd_a = enc.chain(chain_a)
    init_b, upd_b = enc.chain(chain_b)
    fields: list[tuple[int, int]] = [(init_a, 6), (init_b, 6)]
    # decoder reads updates alternating A,B after each emission; the
    # update following weight n-2 is the exhausting read (not on the wire)
    upds = []
    for a, b in zip(upd_a, upd_b):
        upds.append(a)
        upds.append(b)
    if len(upd_a) > len(upd_b):
        upds.append(upd_a[-1])
    fields += upds[: n - 2]
    stream = _BackWriter().pack(fields)
    payload = desc + stream
    if len(payload) > 127:
        return None
    blob = bytes([len(payload)]) + payload
    try:  # self-verify: the zero-extra-bit exhaustion pathology falls back
        got, consumed = _huf_read_weights(blob)
        if consumed != len(blob) or got != explicit:
            return None
    except ValueError:
        return None
    return blob


def _huf_encode_stream(lits, codes) -> bytes:
    fields = [codes[b] for b in lits]
    return _BackWriter().pack(fields)


def _encode_literals(lits: bytes) -> bytes:
    """Literals section: cheapest of Raw / RLE / Huffman-compressed."""
    rs = len(lits)
    if rs == 0:
        return b"\x00"
    if rs > 1 and lits.count(lits[0]) == rs:
        return _lit_header(1, rs) + lits[:1]
    raw = _lit_header(0, rs) + lits
    if rs < 16:
        return raw
    freqs: dict[int, int] = {}
    for b in lits:
        freqs[b] = freqs.get(b, 0) + 1
    if len(freqs) < 2:
        return raw
    weights_full, table_log, codes = _huf_build(freqs)
    hdr = _huf_write_weights(weights_full)
    if hdr is None:
        return raw
    if rs <= 1023:
        body = hdr + _huf_encode_stream(lits, codes)
        cs = len(body)
        if cs > 1023 or cs + 3 >= len(raw):
            return raw
        h = 2 | (0 << 2) | (rs << 4) | (cs << 14)
        return h.to_bytes(3, "little") + body
    share = (rs + 3) // 4
    streams = [
        _huf_encode_stream(lits[0:share], codes),
        _huf_encode_stream(lits[share : 2 * share], codes),
        _huf_encode_stream(lits[2 * share : 3 * share], codes),
        _huf_encode_stream(lits[3 * share :], codes),
    ]
    if any(len(s) > 0xFFFF for s in streams[:3]):
        return raw
    body = (hdr
            + struct.pack("<HHH", len(streams[0]), len(streams[1]),
                          len(streams[2]))
            + b"".join(streams))
    cs = len(body)
    if cs >= len(raw):
        return raw
    if rs <= 0x3FFF and cs <= 0x3FFF:
        h = 2 | (2 << 2) | (rs << 4) | (cs << 18)
        return h.to_bytes(4, "little") + body
    if rs <= 0x3FFFF and cs <= 0x3FFFF:
        h = 2 | (3 << 2) | (rs << 4) | (cs << 22)
        return h.to_bytes(5, "little") + body
    return raw


def _lit_header(ltype: int, rs: int) -> bytes:
    if rs <= 31:
        return bytes([ltype | (rs << 3)])
    if rs <= 4095:
        return bytes([ltype | (1 << 2) | ((rs & 0xF) << 4), rs >> 4])
    return bytes([ltype | (3 << 2) | ((rs & 0xF) << 4),
                  (rs >> 4) & 0xFF, rs >> 12])


# ---------------------------------------------------------- sequences


def _seq_table_choice(codes: list[int], default_enc: _FseEncoder,
                      al_cap: int):
    """Pick the cheapest expressible table for one code stream:
    RLE (mode 1, one byte) for a single distinct code; a custom
    FSE_Compressed table (mode 2, normalized from the actual histogram)
    when there are enough sequences to amortize its description; else the
    RFC Predefined distribution (mode 0, nothing on the wire).
    Returns (mode, encoder, description_bytes)."""
    freqs: dict[int, int] = {}
    for c in codes:
        freqs[c] = freqs.get(c, 0) + 1
    if len(freqs) == 1:
        c = codes[0]
        counts = [0] * c + [1]
        return 1, _FseEncoder(counts, 0), bytes([c])
    if len(codes) >= 64:
        al = min(al_cap, max(5, len(codes).bit_length() - 1))
        while (1 << al) < len(freqs):
            al += 1
        if al <= al_cap:
            try:
                counts = _fse_normalize(freqs, al)
                return 2, _FseEncoder(counts, al), _fse_write_ncount(counts,
                                                                     al)
            except ValueError:
                pass
    return 0, default_enc, b""


def _encode_sequences(seqs: list[tuple[int, int, int]]) -> bytes:
    """Sequences section. Per code stream the cheapest of Predefined /
    RLE / custom FSE_Compressed tables (accuracy caps 9/8/9 for LL/OF/ML
    per RFC 8878 §3.1.1.3.2.1). ``seqs`` holds (literal_length, offset,
    match_length); repeated-offset codes are never used (offset_value =
    offset + 3), so the decoder's rep history needs no mirroring here."""
    nseq = len(seqs)
    if nseq == 0:
        return b"\x00"
    if nseq < 128:
        head = bytes([nseq])
    elif nseq < 0x7F00:
        head = bytes([128 + (nseq >> 8), nseq & 0xFF])
    else:
        v = nseq - 0x7F00
        head = bytes([255, v & 0xFF, (v >> 8) & 0xFF])

    ll_codes, of_codes, ml_codes = [], [], []
    extras = []  # (of_bits, of_nb, ml_bits, ml_nb, ll_bits, ll_nb)
    for ll, off, ml in seqs:
        lc, lbits, lnb = _ll_code(ll)
        ov = off + 3
        oc = ov.bit_length() - 1
        mc, mbits, mnb = _ml_code(ml)
        ll_codes.append(lc)
        of_codes.append(oc)
        ml_codes.append(mc)
        extras.append((ov - (1 << oc), oc, mbits, mnb, lbits, lnb))

    ll_mode, ll_enc, ll_desc = _seq_table_choice(ll_codes, _LL_ENC, 9)
    of_mode, of_enc, of_desc = _seq_table_choice(of_codes, _OF_ENC, 8)
    ml_mode, ml_enc, ml_desc = _seq_table_choice(ml_codes, _ML_ENC, 9)
    # mode byte + descriptions in decoder-read order: LL, OF, ML
    head += bytes([(ll_mode << 6) | (of_mode << 4) | (ml_mode << 2)])
    head += ll_desc + of_desc + ml_desc

    ll_init, ll_upd = ll_enc.chain(ll_codes)
    of_init, of_upd = of_enc.chain(of_codes)
    ml_init, ml_upd = ml_enc.chain(ml_codes)

    fields: list[tuple[int, int]] = [
        (ll_init, ll_enc.log), (of_init, of_enc.log), (ml_init, ml_enc.log),
    ]
    for i, (ob, onb, mb, mnb, lb, lnb) in enumerate(extras):
        fields.append((ob, onb))
        fields.append((mb, mnb))
        fields.append((lb, lnb))
        if i + 1 < nseq:  # decoder update order: LL, ML, OF
            fields.append(ll_upd[i])
            fields.append(ml_upd[i])
            fields.append(of_upd[i])
    return head + _BackWriter().pack(fields)


# -------------------------------------------------------- match finding


def _hash_positions(data: bytes):
    """Vectorized 4-byte rolling hash for every position (numpy uint32
    wraparound arithmetic), one pass over the whole frame."""
    import numpy as np

    if len(data) < 4:
        return None
    a = np.frombuffer(data, dtype=np.uint8)
    v = (a[:-3].astype(np.uint32)
         | (a[1:-2].astype(np.uint32) << np.uint32(8))
         | (a[2:-1].astype(np.uint32) << np.uint32(16))
         | (a[3:].astype(np.uint32) << np.uint32(24)))
    h = (v * np.uint32(_HASH_MUL)) >> np.uint32(32 - _HASH_LOG)
    return h.tolist()


def _literal_entropy_milli(block: bytes) -> int:
    """Shannon entropy of the block's byte histogram in millibits/byte —
    the price a skipped match pays per literal under the Huffman stage."""
    import math

    import numpy as np

    counts = np.bincount(np.frombuffer(block, dtype=np.uint8), minlength=1)
    counts = counts[counts > 0]
    n = counts.sum()
    p = counts / n
    h = float(-(p * np.log2(p)).sum())
    return max(1, int(h * 1000)) if math.isfinite(h) else 8000


def _find_sequences(data: bytes, start: int, end: int, tab: list[int],
                    tab2: list[int], hashes
                    ) -> tuple[list[tuple[int, int, int]], int]:
    """Greedy two-probe LZ77 over data[start:end] (each bucket keeps its
    two most recent positions; the longer match wins, so periodic data
    isn't shadowed by near short matches); the hash tables (and
    offsets) persist across blocks — the single-segment frame window is
    the whole content. A match is only taken when its sequence cost
    (offset extra bits + ~14 bits of codes/state updates) undercuts
    Huffman-coding the same bytes as literals, so low-entropy alphabets
    don't drown in short far matches. Returns (sequences, anchor);
    data[anchor:end] are the block's trailing literals."""
    seqs: list[tuple[int, int, int]] = []
    i = start
    anchor = start
    limit = end - 4  # min match (4) must fit inside the block
    ent = _literal_entropy_milli(data[start:end])
    prev_off = 0  # rep-offset probe: periodic runs resume after a break
    while i <= limit:
        h = hashes[i]
        cand = tab[h]
        cand2 = tab2[h]
        tab2[h] = cand
        tab[h] = i
        best_ml = 0
        best_cand = -1
        max_ml = min(end - i, _MAX_MATCH)
        for c in (cand, cand2, i - prev_off if prev_off else -1):
            if not (c >= 0 and i - c <= _MAX_OFFSET
                    and data[c : c + 4] == data[i : i + 4]):
                continue
            ml = 4
            # chunked extension, then bytewise refinement
            while (ml + 64 <= max_ml
                   and data[c + ml : c + ml + 64]
                   == data[i + ml : i + ml + 64]):
                ml += 64
            while ml < max_ml and data[c + ml] == data[i + ml]:
                ml += 1
            # an older-but-longer match wins; ties prefer the near one
            if ml > best_ml:
                best_ml, best_cand = ml, c
        if best_cand >= 0:
            ml = best_ml
            off = i - best_cand
            if ml * ent < ((off + 3).bit_length() + 13) * 1000:
                i += 1  # literals are cheaper than this sequence
                continue
            seqs.append((i - anchor, off, ml))
            prev_off = off
            # seed the table sparsely inside the match (cheap, helps runs)
            if ml > 2 and i + 2 <= limit:
                tab[hashes[i + 2]] = i + 2
            i += ml
            anchor = i
        else:
            i += 1
    return seqs, anchor


# ------------------------------------------------------------- frames


def compress(data: bytes, checksum: bool = False) -> bytes:
    """One RFC 8878 single-segment frame; per block the cheapest of
    Raw / RLE / Compressed (Huffman literals + Predefined-FSE sequences).
    ``checksum=True`` sets the descriptor flag and appends the XXH64
    low-32 Content_Checksum (verified by libzstd and by our decoder)."""
    n = len(data)
    cflag = 0x04 if checksum else 0
    if n <= 255:
        head = bytes([0x20 | cflag, n])
    elif n - 256 <= 0xFFFF:
        head = bytes([0x60 | cflag]) + struct.pack("<H", n - 256)
    elif n <= 0xFFFFFFFF:
        head = bytes([0xA0 | cflag]) + struct.pack("<I", n)
    else:
        head = bytes([0xE0 | cflag]) + struct.pack("<Q", n)
    out = bytearray(struct.pack("<I", _MAGIC) + head)

    hashes = _hash_positions(data)
    tab = [-1] * (1 << _HASH_LOG)
    tab2 = [-1] * (1 << _HASH_LOG)
    pos = 0
    while True:
        blk_end = min(pos + _BLOCK_MAX, n)
        blk_len = blk_end - pos
        last = 1 if blk_end >= n else 0
        block = data[pos:blk_end]
        if blk_len > 1 and block.count(block[0]) == blk_len:
            out += int((blk_len << 3) | (1 << 1) | last).to_bytes(3, "little")
            out += block[:1]
        else:
            comp = None
            if blk_len >= 16 and hashes is not None:
                seqs, anchor = _find_sequences(data, pos, blk_end, tab,
                                               tab2, hashes)
                if seqs:
                    lits = bytearray()
                    p = pos
                    for ll, _, ml in seqs:
                        lits += data[p : p + ll]
                        p += ll + ml
                    lits += data[anchor:blk_end]
                    body = bytes(lits)
                else:
                    body = block
                cand = _encode_literals(body) + _encode_sequences(seqs)
                if len(cand) < blk_len:
                    comp = cand
            if comp is not None:
                out += int((len(comp) << 3) | (2 << 1) | last).to_bytes(
                    3, "little")
                out += comp
            else:
                out += int((blk_len << 3) | last).to_bytes(3, "little")
                out += block
        pos = blk_end
        if last:
            if checksum:
                from .xxhash64 import xxh64

                out += struct.pack("<I", xxh64(data) & 0xFFFFFFFF)
            return bytes(out)
