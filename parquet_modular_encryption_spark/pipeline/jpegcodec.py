"""Baseline JPEG (ITU-T T.81 sequential DCT, grayscale) encode/decode in
pure stdlib + numpy — the MJPEG payload codec for q91h.

Scope, honestly stated (the q91e PNG / q91g DIB discipline applied to
JPEG): SINGLE-component (grayscale) baseline sequential JPEG — SOI,
APPn/COM (skipped), DQT (8-bit), SOF0, DHT, SOS, entropy-coded scan with
0xFF00 byte stuffing, EOI. The decoder is GENERAL over that profile:
arbitrary canonical Huffman tables from DHT, arbitrary 8-bit quant
tables, full zigzag/dequant/2-D IDCT per block. Progressive (SOF2),
multi-component color, 12-bit precision, and restart intervals raise
``ValueError`` rather than guessing — same refusal contract as
decode_avi_bi_rgb for compressed DIBs.

The ENCODER is deliberately minimal-but-valid: it takes already-
quantized integer coefficient blocks (the fixture uses quant tables of
all ones, so planted flat blocks round-trip EXACTLY — DC-only blocks
reconstruct bit-exact, which is what lets the q91h oracle recompute
pixel sums from ids in SQL), writes fixed-length canonical Huffman
tables into DHT (12 four-bit DC codes, 162 eight-bit AC codes — valid
prefix codes with the all-ones codeword unused), and emits standard
(RUN,SIZE)/ZRL/EOB AC coding with DC differentials. Decoder generality
beyond the fixture's DC-only subspace is pinned by
tests/test_pipeline.py::test_jpeg_codec_roundtrips_random_coefficients
against an independent textbook O(N^4) IDCT.
"""

from __future__ import annotations

import struct

import numpy as np

# Zigzag scan order: ZIGZAG[k] = (row, col) of the k-th coefficient.
ZIGZAG: list[tuple[int, int]] = sorted(
    ((r, c) for r in range(8) for c in range(8)),
    key=lambda rc: (rc[0] + rc[1], rc[0] if (rc[0] + rc[1]) % 2 else -rc[0]),
)

# Orthonormal DCT-II basis: pixels = C.T @ coeffs @ C (and the forward
# transform is C @ block @ C.T). C[u, x] = c(u)/2 * cos((2x+1)u*pi/16).
_C = np.array(
    [
        [
            (np.sqrt(0.5) if u == 0 else 1.0)
            / 2.0
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)

#: Encoder Huffman layout: every DC category (0..11) gets a 4-bit code,
#: every AC symbol (EOB, ZRL, and (run 0..15, size 1..10)) an 8-bit code.
#: Canonical assignment in list order; counts stay below 2^L - 1 so the
#: all-ones codeword is never used.
_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]


def _canonical_codes(bits: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the JPEG canonical construction."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _enc_tables():
    dc_bits = [0] * 16
    dc_bits[3] = len(_DC_SYMBOLS)  # all length 4
    ac_bits = [0] * 16
    ac_bits[7] = len(_AC_SYMBOLS)  # all length 8
    return (
        (dc_bits, _DC_SYMBOLS, _canonical_codes(dc_bits, _DC_SYMBOLS)),
        (ac_bits, _AC_SYMBOLS, _canonical_codes(ac_bits, _AC_SYMBOLS)),
    )


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, value: int, length: int) -> None:
        self._acc = (self._acc << length) | (value & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing inside entropy-coded data
                self.out.append(0x00)

    def flush(self) -> None:
        if self._n:
            self.put((1 << (8 - self._n)) - 1, 8 - self._n)  # 1-pad


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise ValueError("entropy data truncated")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("entropy data truncated at 0xFF")
                marker = self.data[self.pos]
                if marker == 0x00:
                    self.pos += 1  # stuffed data byte
                else:
                    raise ValueError(
                        f"unexpected marker 0xFF{marker:02X} inside scan "
                        "(restart intervals are out of scope)"
                    )
            self._acc = byte
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _extend(value: int, size: int) -> int:
    """JPEG EXTEND: map the SIZE-bit raw value to its signed coefficient."""
    if size == 0:
        return 0
    if value < (1 << (size - 1)):
        return value - (1 << size) + 1
    return value


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def encode_jpeg_gray(
    width: int, height: int, coeff_blocks: "np.ndarray"
) -> bytes:
    """Serialize already-quantized coefficient blocks (shape
    (n_by, n_bx, 8, 8), int, natural order; quant table all ones) as a
    baseline grayscale JPEG. n_by/n_bx must cover ceil(h/8) x ceil(w/8)."""
    n_by = (height + 7) // 8
    n_bx = (width + 7) // 8
    blocks = np.asarray(coeff_blocks, dtype=np.int64)
    if blocks.shape != (n_by, n_bx, 8, 8):
        raise ValueError(f"expected {(n_by, n_bx, 8, 8)}, got {blocks.shape}")

    (dc_bits, dc_syms, dc_codes), (ac_bits, ac_syms, ac_codes) = _enc_tables()
    w = _BitWriter()
    prev_dc = 0
    for by in range(n_by):
        for bx in range(n_bx):
            blk = blocks[by, bx]
            zz = [int(blk[r, c]) for r, c in ZIGZAG]
            diff = zz[0] - prev_dc
            prev_dc = zz[0]
            s = _category(diff)
            code, length = dc_codes[s]
            w.put(code, length)
            if s:
                w.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
            run = 0
            for k in range(1, 64):
                if zz[k] == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = ac_codes[0xF0]
                    w.put(code, length)
                    run -= 16
                s = _category(zz[k])
                if s > 10:
                    raise ValueError(f"AC coefficient {zz[k]} exceeds SIZE 10")
                code, length = ac_codes[(run << 4) | s]
                w.put(code, length)
                w.put(zz[k] if zz[k] >= 0 else zz[k] + (1 << s) - 1, s)
                run = 0
            if run:
                code, length = ac_codes[0x00]  # EOB
                w.put(code, length)
    w.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def dht(cls: int, bits: list[int], syms: list[int]) -> bytes:
        return bytes([cls << 4]) + bytes(bits) + bytes(syms)

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFDB, bytes([0]) + bytes([1] * 64))  # DQT id 0, all ones
    out += seg(0xFFC0, struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0]))
    out += seg(0xFFC4, dht(0, dc_bits, dc_syms) + dht(1, ac_bits, ac_syms))
    out += seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += w.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_gray_flat(width: int, height: int, block_values) -> bytes:
    """Flat-block encoder for planted fixtures: block_values has shape
    (ceil(h/8), ceil(w/8)), each an 8-bit gray level; every block becomes
    DC-only with DC = 8*(v-128) (the orthonormal DCT of a flat block),
    which survives quant=1 and reconstructs bit-exact."""
    vals = np.asarray(block_values, dtype=np.int64)
    blocks = np.zeros(vals.shape + (8, 8), dtype=np.int64)
    blocks[:, :, 0, 0] = 8 * (vals - 128)
    return encode_jpeg_gray(width, height, blocks)


def _parse_dht(payload: bytes) -> dict[tuple[int, int], dict[tuple[int, int], int]]:
    """DHT payload -> {(class, id): {(length, code): symbol}}."""
    tables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    i = 0
    while i < len(payload):
        tc, th = payload[i] >> 4, payload[i] & 0xF
        bits = list(payload[i + 1 : i + 17])
        n = sum(bits)
        syms = list(payload[i + 17 : i + 17 + n])
        lut: dict[tuple[int, int], int] = {}
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                lut[(length, code)] = syms[k]
                code += 1
                k += 1
            code <<= 1
        tables[(tc, th)] = lut
        i += 17 + n
    return tables


def _huff_decode(r: _BitReader, lut: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | r.bit()
        length += 1
        sym = lut.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in scan")


def decode_jpeg_gray(data: bytes) -> tuple[int, int, "np.ndarray"]:
    """(width, height, pixels uint8 [h, w]) from a baseline grayscale
    JPEG. General over the module's stated profile; raises on anything
    outside it."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    i = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    width = height = None
    comp_qt = comp_dc = comp_ac = 0
    while i + 4 <= len(data):
        if data[i] != 0xFF:
            raise ValueError(f"expected marker at {i}, got {data[i]:#x}")
        marker = data[i + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", data, i + 2)
        payload = data[i + 4 : i + 2 + seglen]
        if len(payload) != seglen - 2:
            raise ValueError("marker segment truncated")
        i += 2 + seglen
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(payload):
                pq, tq = payload[j] >> 4, payload[j] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables are out of scope")
                tab = np.zeros((8, 8), dtype=np.int64)
                for k, (r_, c_) in enumerate(ZIGZAG):
                    tab[r_, c_] = payload[j + 1 + k]
                qt[tq] = tab
                j += 65
        elif marker == 0xC4:  # DHT
            huff.update(_parse_dht(payload))
        elif marker == 0xC0:  # SOF0 baseline
            precision, height, width, ncomp = struct.unpack_from(">BHHB", payload, 0)
            if precision != 8:
                raise ValueError("only 8-bit precision supported")
            if ncomp != 1:
                raise ValueError("only single-component (grayscale) JPEG supported")
            # per-component: id, sampling, quant-table id (after the
            # 6-byte precision/height/width/ncomp header)
            if payload[7] != 0x11:
                raise ValueError("subsampling on a 1-component image is malformed")
            comp_qt = payload[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"SOF{marker - 0xC0} (non-baseline-sequential) is out of scope"
            )
        elif marker == 0xDD:
            raise ValueError("restart intervals (DRI) are out of scope")
        elif marker == 0xDA:  # SOS — entropy data follows the header
            if width is None:
                raise ValueError("SOS before SOF0")
            ns = payload[0]
            if ns != 1:
                raise ValueError("only single-component scans supported")
            comp_dc, comp_ac = payload[2] >> 4, payload[2] & 0xF
            reader = _BitReader(data, i)
            return width, height, _decode_scan(
                reader, width, height, qt[comp_qt], huff[(0, comp_dc)],
                huff[(1, comp_ac)],
            )
        # APPn / COM / others: skipped
    raise ValueError("no SOS marker found")


def _decode_scan(
    r: _BitReader,
    width: int,
    height: int,
    quant: "np.ndarray",
    dc_lut: dict,
    ac_lut: dict,
) -> "np.ndarray":
    n_by = (height + 7) // 8
    n_bx = (width + 7) // 8
    out = np.zeros((n_by * 8, n_bx * 8), dtype=np.uint8)
    prev_dc = 0
    for by in range(n_by):
        for bx in range(n_bx):
            blk = np.zeros((8, 8), dtype=np.int64)
            s = _huff_decode(r, dc_lut)
            prev_dc += _extend(r.bits(s), s)
            blk[0, 0] = prev_dc
            k = 1
            while k < 64:
                sym = _huff_decode(r, ac_lut)
                if sym == 0x00:  # EOB
                    break
                if sym == 0xF0:  # ZRL
                    k += 16
                    continue
                run, size = sym >> 4, sym & 0xF
                k += run
                if k > 63:
                    raise ValueError("AC run overflows the block")
                rr, cc = ZIGZAG[k]
                blk[rr, cc] = _extend(r.bits(size), size)
                k += 1
            px = _C.T @ (blk * quant).astype(np.float64) @ _C
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                np.round(px) + 128, 0, 255
            ).astype(np.uint8)
    return out[:height, :width]
