"""Baseline JPEG (ITU-T T.81 sequential DCT, grayscale) encode/decode in
pure stdlib + numpy — the MJPEG payload codec for q91h.

Scope, honestly stated (the q91e PNG / q91g DIB discipline applied to
JPEG): SINGLE-component (grayscale) baseline sequential JPEG — SOI,
APPn/COM (skipped), DQT (8-bit), SOF0, DHT, SOS, entropy-coded scan with
0xFF00 byte stuffing, EOI. The decoder is GENERAL over that profile:
arbitrary canonical Huffman tables from DHT, arbitrary 8-bit quant
tables, full zigzag/dequant/2-D IDCT per block, and — since r13 —
restart intervals (DRI + RSTm markers: byte realignment, DC predictor
reset, modulo-8 marker-index verification; the most common real-encoder
feature previously refused). Progressive (SOF2), 12-bit precision, and
sampling layouts beyond 4:2:0/4:4:4 raise ``ValueError`` rather than
guessing — same refusal contract as decode_avi_bi_rgb for compressed
DIBs. Grayscale-vs-color component counts still route to the matching
decoder.

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
                        "(desynchronized restart or truncated segment)"
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

    def sync_restart(self, m: int) -> None:
        """Consume the RSTm marker at a restart boundary (r13, T.81
        §B.2.1.2/§E.2.4): discard the rest of the current byte — the
        encoder 1-padded to byte alignment before the marker — then
        require 0xFF 0xD0+m verbatim at the stream position. The modulo-8
        index is checked, not assumed: a skipped or reordered restart is
        a corruption signal, and resynchronizing silently would decode
        shifted garbage."""
        self._n = 0  # byte-align: the encoder's pad bits end here
        if self.pos + 1 >= len(self.data):
            raise ValueError("entropy data truncated at restart boundary")
        got = (self.data[self.pos], self.data[self.pos + 1])
        if got != (0xFF, 0xD0 + m):
            raise ValueError(
                f"expected RST{m} at offset {self.pos}, got "
                f"0x{got[0]:02X}{got[1]:02X}"
            )
        self.pos += 2


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
    width: int, height: int, coeff_blocks: "np.ndarray", restart_interval: int = 0
) -> bytes:
    """Serialize already-quantized coefficient blocks (shape
    (n_by, n_bx, 8, 8), int, natural order; quant table all ones) as a
    baseline grayscale JPEG. n_by/n_bx must cover ceil(h/8) x ceil(w/8).
    ``restart_interval`` > 0 emits a DRI segment and an RSTm marker
    (byte-aligned, DC predictor reset, m cycling 0-7) after every that
    many MCUs — the T.81 §E.2.4 feature real encoders use for error
    resilience and parallel decode. 0 (default) emits the historic
    byte-identical stream."""
    n_by = (height + 7) // 8
    n_bx = (width + 7) // 8
    blocks = np.asarray(coeff_blocks, dtype=np.int64)
    if blocks.shape != (n_by, n_bx, 8, 8):
        raise ValueError(f"expected {(n_by, n_bx, 8, 8)}, got {blocks.shape}")

    (dc_bits, dc_syms, dc_codes), (ac_bits, ac_syms, ac_codes) = _enc_tables()
    w = _BitWriter()
    prev_dc = 0
    mcu_idx = rst = 0
    for by in range(n_by):
        for bx in range(n_bx):
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                w.flush()  # 1-pad to the byte boundary, per spec
                w.out += bytes([0xFF, 0xD0 + rst])  # raw marker: never stuffed
                rst = (rst + 1) % 8
                prev_dc = 0
            mcu_idx += 1
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
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
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
    restart_interval = 0
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
        elif marker == 0xDD:  # DRI (r13): restart every Ri MCUs; 0 disables
            (restart_interval,) = struct.unpack_from(">H", payload, 0)
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
                huff[(1, comp_ac)], restart_interval,
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
    restart_interval: int = 0,
) -> "np.ndarray":
    n_by = (height + 7) // 8
    n_bx = (width + 7) // 8
    out = np.zeros((n_by * 8, n_bx * 8), dtype=np.uint8)
    prev_dc = 0
    mcu_idx = rst = 0
    for by in range(n_by):
        for bx in range(n_bx):
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                r.sync_restart(rst)
                rst = (rst + 1) % 8
                prev_dc = 0
            mcu_idx += 1
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


# ---------------------------------------------------------------------------
# Color (3-component YCbCr) baseline JPEG — round 12 (VERDICT r11 #8).
#
# Scope, honestly stated: 3-component baseline sequential JPEG in the two
# sampling layouts real encoders emit for photos — 4:2:0 (Y 2x2, chroma
# 1x1) and 4:4:4 (all 1x1) — with 8-bit precision, one interleaved scan,
# per-component quant/Huffman table ids, and (since r13) restart
# intervals. Anything else (other sampling combos, SOF2, 12-bit) raises.
# Chroma upsampling for 4:2:0 is NEAREST-NEIGHBOR (sample replication) —
# T.81 leaves the filter to the decoder, and replication is the one
# choice that keeps flat planted blocks BIT-EXACT, which is what lets
# the q91j oracle recompute pixel sums from ids in SQL.
#
# YCbCr -> RGB is the module's EXACT integer contract (the libjpeg
# fixed-point formulation, SCALEBITS = 16):
#   R = clamp(Y + ((91881*(Cr-128) + 32768) >> 16))
#   G = clamp(Y - ((22554*(Cb-128) + 46802*(Cr-128) + 32768) >> 16))
#   B = clamp(Y + ((116130*(Cb-128) + 32768) >> 16))
# (91881 = round(1.40200 * 2^16), 22554 = 0.34414, 46802 = 0.71414,
# 116130 = 1.77200; >> is the arithmetic shift == floor division by
# 2^16, reproducible in SQL as FLOOR(x / 65536.0).)
# ---------------------------------------------------------------------------

_YCC_CR_R = 91881
_YCC_CB_G = 22554
_YCC_CR_G = 46802
_YCC_CB_B = 116130
_YCC_HALF = 32768


def ycbcr_to_rgb(y: "np.ndarray", cb: "np.ndarray", cr: "np.ndarray") -> "np.ndarray":
    """Exact fixed-point YCbCr -> RGB (see the contract above); inputs are
    same-shape uint8 planes, output is (h, w, 3) uint8."""
    yy = y.astype(np.int64)
    cbd = cb.astype(np.int64) - 128
    crd = cr.astype(np.int64) - 128
    r = yy + ((_YCC_CR_R * crd + _YCC_HALF) >> 16)
    g = yy - ((_YCC_CB_G * cbd + _YCC_CR_G * crd + _YCC_HALF) >> 16)
    b = yy + ((_YCC_CB_B * cbd + _YCC_HALF) >> 16)
    return np.stack(
        [np.clip(p, 0, 255).astype(np.uint8) for p in (r, g, b)], axis=-1
    )


def encode_jpeg_ycbcr(
    width: int,
    height: int,
    blocks_y: "np.ndarray",
    blocks_cb: "np.ndarray",
    blocks_cr: "np.ndarray",
    sampling: str = "420",
    restart_interval: int = 0,
) -> bytes:
    """Serialize already-quantized coefficient blocks as a 3-component
    baseline JPEG (quant tables all ones, ids 0/1; canonical Huffman
    tables registered under ids 0 AND 1 of each class).

    sampling="420": MCU = 2x2 Y blocks + 1 Cb + 1 Cr; blocks_y has shape
    (2*n_mcuy, 2*n_mcux, 8, 8), chroma (n_mcuy, n_mcux, 8, 8) where
    n_mcux = ceil(w/16), n_mcuy = ceil(h/16). sampling="444": one block
    of each component per MCU, all shapes (ceil(h/8), ceil(w/8), 8, 8)."""
    if sampling == "420":
        n_mcux, n_mcuy = (width + 15) // 16, (height + 15) // 16
        y_shape = (2 * n_mcuy, 2 * n_mcux, 8, 8)
        c_shape = (n_mcuy, n_mcux, 8, 8)
        samp_y = 0x22
    elif sampling == "444":
        n_mcux, n_mcuy = (width + 7) // 8, (height + 7) // 8
        y_shape = c_shape = (n_mcuy, n_mcux, 8, 8)
        samp_y = 0x11
    else:
        raise ValueError("sampling must be '420' or '444'")
    by = np.asarray(blocks_y, dtype=np.int64)
    bcb = np.asarray(blocks_cb, dtype=np.int64)
    bcr = np.asarray(blocks_cr, dtype=np.int64)
    if by.shape != y_shape or bcb.shape != c_shape or bcr.shape != c_shape:
        raise ValueError(
            f"expected Y {y_shape} / chroma {c_shape}, got "
            f"{by.shape}/{bcb.shape}/{bcr.shape}"
        )

    (dc_bits, dc_syms, dc_codes), (ac_bits, ac_syms, ac_codes) = _enc_tables()
    w = _BitWriter()
    prev_dc = [0, 0, 0]  # per component

    def put_block(blk: "np.ndarray", comp: int) -> None:
        zz = [int(blk[r, c]) for r, c in ZIGZAG]
        diff = zz[0] - prev_dc[comp]
        prev_dc[comp] = zz[0]
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
            code, length = ac_codes[0x00]
            w.put(code, length)

    mcu_idx = rst = 0
    for my in range(n_mcuy):
        for mx in range(n_mcux):
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                w.flush()
                w.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                prev_dc[:] = [0, 0, 0]
            mcu_idx += 1
            if sampling == "420":
                for vy in range(2):
                    for vx in range(2):
                        put_block(by[2 * my + vy, 2 * mx + vx], 0)
            else:
                put_block(by[my, mx], 0)
            put_block(bcb[my, mx], 1)
            put_block(bcr[my, mx], 2)
    w.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def dht(cls: int, tid: int, bits: list[int], syms: list[int]) -> bytes:
        return bytes([(cls << 4) | tid]) + bytes(bits) + bytes(syms)

    out = bytearray(b"\xff\xd8")
    out += seg(0xFFDB, bytes([0]) + bytes([1] * 64) + bytes([1]) + bytes([1] * 64))
    out += seg(
        0xFFC0,
        struct.pack(">BHHB", 8, height, width, 3)
        + bytes([1, samp_y, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    out += seg(
        0xFFC4,
        dht(0, 0, dc_bits, dc_syms) + dht(1, 0, ac_bits, ac_syms)
        + dht(0, 1, dc_bits, dc_syms) + dht(1, 1, ac_bits, ac_syms),
    )
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    out += seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    out += w.out
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_color_flat(
    width: int, height: int, y_vals, cb_vals, cr_vals, sampling: str = "420",
    restart_interval: int = 0,
) -> bytes:
    """Flat-block color encoder for planted fixtures: per-block 8-bit
    levels per component (Y per 8x8 block; chroma per MCU for 4:2:0, per
    block for 4:4:4) become DC-only blocks with DC = 8*(v-128), which
    survive quant=1 and reconstruct bit-exact. ``restart_interval``
    passes through to :func:`encode_jpeg_ycbcr` (q91k's DRI fixtures)."""

    def flat(vals) -> "np.ndarray":
        v = np.asarray(vals, dtype=np.int64)
        blocks = np.zeros(v.shape + (8, 8), dtype=np.int64)
        blocks[:, :, 0, 0] = 8 * (v - 128)
        return blocks

    return encode_jpeg_ycbcr(
        width, height, flat(y_vals), flat(cb_vals), flat(cr_vals), sampling,
        restart_interval,
    )


def decode_jpeg_color(data: bytes) -> tuple[int, int, "np.ndarray"]:
    """(width, height, rgb uint8 [h, w, 3]) from a 3-component baseline
    JPEG in 4:2:0 or 4:4:4. General over that profile (arbitrary DHT/DQT
    per component); refuses grayscale (decode_jpeg_gray's job), other
    sampling layouts, and everything the module's scope statement
    excludes."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    i = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    width = height = None
    comps: list[tuple[int, int, int, int]] = []  # id, h, v, tq
    restart_interval = 0
    while i + 4 <= len(data):
        if data[i] != 0xFF:
            raise ValueError(f"expected marker at {i}, got {data[i]:#x}")
        marker = data[i + 1]
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", data, i + 2)
        payload = data[i + 4 : i + 2 + seglen]
        if len(payload) != seglen - 2:
            raise ValueError("marker segment truncated")
        i += 2 + seglen
        if marker == 0xDB:
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
        elif marker == 0xC4:
            huff.update(_parse_dht(payload))
        elif marker == 0xC0:
            precision, height, width, ncomp = struct.unpack_from(">BHHB", payload, 0)
            if precision != 8:
                raise ValueError("only 8-bit precision supported")
            if ncomp != 3:
                raise ValueError(
                    "decode_jpeg_color handles 3-component JPEG only "
                    "(grayscale is decode_jpeg_gray's job)"
                )
            for c in range(3):
                cid, samp, tq = payload[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, samp >> 4, samp & 0xF, tq))
            samps = [(h, v) for _, h, v, _ in comps]
            if samps not in ([(2, 2), (1, 1), (1, 1)], [(1, 1), (1, 1), (1, 1)]):
                raise ValueError(
                    f"sampling {samps} out of scope (4:2:0 and 4:4:4 only)"
                )
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"SOF{marker - 0xC0} (non-baseline-sequential) is out of scope"
            )
        elif marker == 0xDD:  # DRI (r13): restart every Ri MCUs; 0 disables
            (restart_interval,) = struct.unpack_from(">H", payload, 0)
        elif marker == 0xDA:
            if width is None:
                raise ValueError("SOS before SOF0")
            ns = payload[0]
            if ns != 3:
                raise ValueError("expected one interleaved 3-component scan")
            scan_tabs: dict[int, tuple[int, int]] = {}
            for c in range(3):
                cid, tabs = payload[1 + 2 * c], payload[2 + 2 * c]
                scan_tabs[cid] = (tabs >> 4, tabs & 0xF)
            reader = _BitReader(data, i)
            hmax = max(h for _, h, _, _ in comps)
            vmax = max(v for _, _, v, _ in comps)
            n_mcux = (width + 8 * hmax - 1) // (8 * hmax)
            n_mcuy = (height + 8 * vmax - 1) // (8 * vmax)
            planes = [
                np.zeros((n_mcuy * v * 8, n_mcux * h * 8), dtype=np.uint8)
                for _, h, v, _ in comps
            ]
            prev_dc = [0, 0, 0]
            mcu_idx = rst = 0
            for my in range(n_mcuy):
                for mx in range(n_mcux):
                    if (
                        restart_interval
                        and mcu_idx
                        and mcu_idx % restart_interval == 0
                    ):
                        reader.sync_restart(rst)
                        rst = (rst + 1) % 8
                        prev_dc = [0, 0, 0]
                    mcu_idx += 1
                    for ci, (cid, h, v, tq) in enumerate(comps):
                        dc_lut = huff[(0, scan_tabs[cid][0])]
                        ac_lut = huff[(1, scan_tabs[cid][1])]
                        for vy in range(v):
                            for vx in range(h):
                                blk = np.zeros((8, 8), dtype=np.int64)
                                s = _huff_decode(r=reader, lut=dc_lut)
                                prev_dc[ci] += _extend(reader.bits(s), s)
                                blk[0, 0] = prev_dc[ci]
                                k = 1
                                while k < 64:
                                    sym = _huff_decode(reader, ac_lut)
                                    if sym == 0x00:
                                        break
                                    if sym == 0xF0:
                                        k += 16
                                        continue
                                    run, size = sym >> 4, sym & 0xF
                                    k += run
                                    if k > 63:
                                        raise ValueError(
                                            "AC run overflows the block"
                                        )
                                    rr, cc = ZIGZAG[k]
                                    blk[rr, cc] = _extend(reader.bits(size), size)
                                    k += 1
                                px = _C.T @ (blk * qt[tq]).astype(np.float64) @ _C
                                y0 = (my * v + vy) * 8
                                x0 = (mx * h + vx) * 8
                                planes[ci][y0 : y0 + 8, x0 : x0 + 8] = np.clip(
                                    np.round(px) + 128, 0, 255
                                ).astype(np.uint8)
            up = []
            for (cid, h, v, _tq), plane in zip(comps, planes):
                if (h, v) != (hmax, vmax):
                    plane = np.repeat(
                        np.repeat(plane, vmax // v, axis=0), hmax // h, axis=1
                    )
                up.append(plane[:height, :width])
            return width, height, ycbcr_to_rgb(up[0], up[1], up[2])
    raise ValueError("no SOS marker found")
