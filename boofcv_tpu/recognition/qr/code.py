"""QR code symbol encode/decode (module-matrix level).

Reference analog: boofcv-recognition alg/fiducial/qrcode/ —
QrCodeEncoder.java / QrCodeGeneratorImage (construction),
QrCodeDecoderBits.java (bit stream + RS), QrCodeMaskPattern.java,
QrCodeCodeWordLocations (placement), QrCode.java VERSION_INFO tables.

Scope: versions 1-10, byte mode, all four error levels, all masks.
Image-plane localization lives in qr/detector.py; this module works on
the boolean module matrix (True = dark).
"""

from __future__ import annotations

import numpy as np

from boofcv_tpu.recognition.qr.reed_solomon import ReedSolomon

# (version, level) -> (ecc_per_block, [(num_blocks, data_codewords), ...])
BLOCKS = {
    (1, "L"): (7, [(1, 19)]), (1, "M"): (10, [(1, 16)]),
    (1, "Q"): (13, [(1, 13)]), (1, "H"): (17, [(1, 9)]),
    (2, "L"): (10, [(1, 34)]), (2, "M"): (16, [(1, 28)]),
    (2, "Q"): (22, [(1, 22)]), (2, "H"): (28, [(1, 16)]),
    (3, "L"): (15, [(1, 55)]), (3, "M"): (26, [(1, 44)]),
    (3, "Q"): (18, [(2, 17)]), (3, "H"): (22, [(2, 13)]),
    (4, "L"): (20, [(1, 80)]), (4, "M"): (18, [(2, 32)]),
    (4, "Q"): (26, [(2, 24)]), (4, "H"): (16, [(4, 9)]),
    (5, "L"): (26, [(1, 108)]), (5, "M"): (24, [(2, 43)]),
    (5, "Q"): (18, [(2, 15), (2, 16)]), (5, "H"): (22, [(2, 11), (2, 12)]),
    (6, "L"): (18, [(2, 68)]), (6, "M"): (16, [(4, 27)]),
    (6, "Q"): (24, [(4, 19)]), (6, "H"): (28, [(4, 15)]),
    (7, "L"): (20, [(2, 78)]), (7, "M"): (18, [(4, 31)]),
    (7, "Q"): (18, [(2, 14), (4, 15)]), (7, "H"): (26, [(4, 13), (1, 14)]),
    (8, "L"): (24, [(2, 97)]), (8, "M"): (22, [(2, 38), (2, 39)]),
    (8, "Q"): (22, [(4, 18), (2, 19)]), (8, "H"): (26, [(4, 14), (2, 15)]),
    (9, "L"): (30, [(2, 116)]), (9, "M"): (22, [(3, 36), (2, 37)]),
    (9, "Q"): (20, [(4, 16), (4, 17)]), (9, "H"): (24, [(4, 12), (4, 13)]),
    (10, "L"): (18, [(2, 68), (2, 69)]), (10, "M"): (26, [(4, 43), (1, 44)]),
    (10, "Q"): (24, [(6, 19), (2, 20)]), (10, "H"): (28, [(6, 15), (2, 16)]),
}

ALIGNMENT = {1: [], 2: [6, 18], 3: [6, 22], 4: [6, 26], 5: [6, 30],
             6: [6, 34], 7: [6, 22, 38], 8: [6, 24, 42], 9: [6, 26, 46],
             10: [6, 28, 50]}

LEVEL_BITS = {"L": 0b01, "M": 0b00, "Q": 0b11, "H": 0b10}
BITS_LEVEL = {v: k for k, v in LEVEL_BITS.items()}

MASKS = [
    lambda r, c: (r + c) % 2 == 0,
    lambda r, c: r % 2 == 0,
    lambda r, c: c % 3 == 0,
    lambda r, c: (r + c) % 3 == 0,
    lambda r, c: (r // 2 + c // 3) % 2 == 0,
    lambda r, c: (r * c) % 2 + (r * c) % 3 == 0,
    lambda r, c: ((r * c) % 2 + (r * c) % 3) % 2 == 0,
    lambda r, c: ((r + c) % 2 + (r * c) % 3) % 2 == 0,
]


def _bch_format(data5: int) -> int:
    """15-bit format info: 5 data bits + 10 BCH bits, masked."""
    g = 0b10100110111
    v = data5 << 10
    for i in range(14, 9, -1):
        if v & (1 << i):
            v ^= g << (i - 10)
    return ((data5 << 10) | v) ^ 0b101010000010010


def data_capacity_bytes(version: int, level: str) -> int:
    ecc, blocks = BLOCKS[(version, level)]
    return sum(n * d for n, d in blocks)


def _function_mask(version: int) -> np.ndarray:
    """True where a module is a function pattern (not data)."""
    n = 4 * version + 17
    m = np.zeros((n, n), bool)
    for (r, c) in ((0, 0), (0, n - 7), (n - 7, 0)):
        m[max(r - 1, 0):r + 8, max(c - 1, 0):c + 8] = True
    m[6, :] = True
    m[:, 6] = True
    # format areas
    m[8, :9] = True
    m[:9, 8] = True
    m[8, n - 8:] = True
    m[n - 8:, 8] = True
    for cy in ALIGNMENT[version]:
        for cx in ALIGNMENT[version]:
            if (cy < 9 and cx < 9) or (cy < 9 and cx > n - 10) or \
               (cy > n - 10 and cx < 9):
                continue
            m[cy - 2:cy + 3, cx - 2:cx + 3] = True
    if version >= 7:
        m[:6, n - 11:n - 8] = True
        m[n - 11:n - 8, :6] = True
    return m


def _draw_function_patterns(mat: np.ndarray, version: int) -> None:
    n = mat.shape[0]

    def finder(r, c):
        for dr in range(-1, 8):
            for dc in range(-1, 8):
                rr, cc = r + dr, c + dc
                if not (0 <= rr < n and 0 <= cc < n):
                    continue
                inside = 0 <= dr <= 6 and 0 <= dc <= 6
                ring = inside and (dr in (0, 6) or dc in (0, 6))
                core = 2 <= dr <= 4 and 2 <= dc <= 4
                mat[rr, cc] = bool(ring or core)

    finder(0, 0)
    finder(0, n - 7)
    finder(n - 7, 0)
    for i in range(8, n - 8):
        mat[6, i] = (i % 2 == 0)
        mat[i, 6] = (i % 2 == 0)
    for cy in ALIGNMENT[version]:
        for cx in ALIGNMENT[version]:
            if (cy < 9 and cx < 9) or (cy < 9 and cx > n - 10) or \
               (cy > n - 10 and cx < 9):
                continue
            for dr in range(-2, 3):
                for dc in range(-2, 3):
                    mat[cy + dr, cx + dc] = max(abs(dr), abs(dc)) != 1
    mat[n - 8, 8] = True  # dark module


def _place_bits(version: int):
    """Module (row, col) visit order for data bits (zigzag placement)."""
    n = 4 * version + 17
    fm = _function_mask(version)
    order = []
    col = n - 1
    upward = True
    while col > 0:
        if col == 6:
            col -= 1
        rows = range(n - 1, -1, -1) if upward else range(n)
        for r in rows:
            for c in (col, col - 1):
                if not fm[r, c]:
                    order.append((r, c))
        upward = not upward
        col -= 2
    return order


def _build_codewords(data: bytes, version: int, level: str) -> list:
    cap = data_capacity_bytes(version, level)
    bits = []

    def put(val, nbits):
        for i in range(nbits - 1, -1, -1):
            bits.append((val >> i) & 1)

    put(0b0100, 4)                       # byte mode
    put(len(data), 8 if version <= 9 else 16)
    for b in data:
        put(b, 8)
    # terminator + byte alignment
    put(0, min(4, cap * 8 - len(bits)))
    while len(bits) % 8:
        bits.append(0)
    cw = [int("".join(map(str, bits[i:i + 8])), 2)
          for i in range(0, len(bits), 8)]
    pads = [0xEC, 0x11]
    i = 0
    while len(cw) < cap:
        cw.append(pads[i % 2])
        i += 1
    return cw


def _interleave(cw: list, version: int, level: str) -> list:
    ecc_n, blocks = BLOCKS[(version, level)]
    rs = ReedSolomon(ecc_n)
    datas = []
    eccs = []
    idx = 0
    for (cnt, dlen) in blocks:
        for _ in range(cnt):
            block = cw[idx:idx + dlen]
            idx += dlen
            datas.append(block)
            eccs.append(rs.encode(block))
    out = []
    for i in range(max(len(b) for b in datas)):
        for b in datas:
            if i < len(b):
                out.append(b[i])
    for i in range(ecc_n):
        for e in eccs:
            out.append(e[i])
    return out


def _deinterleave(stream: list, version: int, level: str):
    ecc_n, blocks = BLOCKS[(version, level)]
    sizes = [d for (cnt, d) in blocks for _ in range(cnt)]
    nblocks = len(sizes)
    datas = [[] for _ in range(nblocks)]
    it = iter(stream)
    for i in range(max(sizes)):
        for b in range(nblocks):
            if i < sizes[b]:
                datas[b].append(next(it))
    eccs = [[] for _ in range(nblocks)]
    for i in range(ecc_n):
        for b in range(nblocks):
            eccs[b].append(next(it))
    return datas, eccs


def encode(text: str | bytes, version: int = 2, level: str = "M",
           mask: int = 0) -> np.ndarray:
    """Encode text into a boolean module matrix (True = dark)."""
    data = text.encode("utf8") if isinstance(text, str) else bytes(text)
    n = 4 * version + 17
    mat = np.zeros((n, n), bool)
    _draw_function_patterns(mat, version)
    cw = _build_codewords(data, version, level)
    stream = _interleave(cw, version, level)
    order = _place_bits(version)
    bits = []
    for c in stream:
        for i in range(7, -1, -1):
            bits.append((c >> i) & 1)
    bits += [0] * (len(order) - len(bits))
    mfn = MASKS[mask]
    for (r, c), b in zip(order, bits):
        mat[r, c] = bool(b) ^ mfn(r, c)
    # format info
    fmt = _bch_format((LEVEL_BITS[level] << 3) | mask)
    fbits = [(fmt >> i) & 1 for i in range(14, -1, -1)]
    coords_a = [(8, 0), (8, 1), (8, 2), (8, 3), (8, 4), (8, 5), (8, 7),
                (8, 8), (7, 8), (5, 8), (4, 8), (3, 8), (2, 8), (1, 8), (0, 8)]
    coords_b = [(n - 1, 8), (n - 2, 8), (n - 3, 8), (n - 4, 8), (n - 5, 8),
                (n - 6, 8), (n - 7, 8), (8, n - 8), (8, n - 7), (8, n - 6),
                (8, n - 5), (8, n - 4), (8, n - 3), (8, n - 2), (8, n - 1)]
    for (r, c), b in zip(coords_a, fbits):
        mat[r, c] = bool(b)
    for (r, c), b in zip(coords_b, fbits):
        mat[r, c] = bool(b)
    return mat


def _read_format(mat: np.ndarray):
    n = mat.shape[0]
    coords_a = [(8, 0), (8, 1), (8, 2), (8, 3), (8, 4), (8, 5), (8, 7),
                (8, 8), (7, 8), (5, 8), (4, 8), (3, 8), (2, 8), (1, 8), (0, 8)]
    coords_b = [(n - 1, 8), (n - 2, 8), (n - 3, 8), (n - 4, 8), (n - 5, 8),
                (n - 6, 8), (n - 7, 8), (8, n - 8), (8, n - 7), (8, n - 6),
                (8, n - 5), (8, n - 4), (8, n - 3), (8, n - 2), (8, n - 1)]

    def try_read(coords):
        v = 0
        for (r, c) in coords:
            v = (v << 1) | int(mat[r, c])
        # brute-force BCH decode: nearest valid codeword
        best, bd = None, 99
        for d5 in range(32):
            cand = _bch_format(d5)
            dist = bin(cand ^ v).count("1")
            if dist < bd:
                bd, best = dist, d5
        return best if bd <= 3 else None

    d5 = try_read(coords_a)
    if d5 is None:
        d5 = try_read(coords_b)
    if d5 is None:
        return None
    return BITS_LEVEL[(d5 >> 3) & 0b11], d5 & 0b111


def decode(mat: np.ndarray):
    """Decode a boolean module matrix.  Returns (bytes, info dict) or
    (None, reason)."""
    mat = np.asarray(mat, bool)
    n = mat.shape[0]
    version = (n - 17) // 4
    if version < 1 or version > 10 or 4 * version + 17 != n:
        return None, {"error": "bad size"}
    f = _read_format(mat)
    if f is None:
        return None, {"error": "format"}
    level, mask = f
    mfn = MASKS[mask]
    order = _place_bits(version)
    bits = [int(mat[r, c]) ^ int(mfn(r, c)) for (r, c) in order]
    ecc_n, blocks = BLOCKS[(version, level)]
    total = data_capacity_bytes(version, level) + ecc_n * sum(
        c for c, _ in blocks)
    stream = [int("".join(map(str, bits[i:i + 8])), 2)
              for i in range(0, total * 8, 8)]
    datas, eccs = _deinterleave(stream, version, level)
    rs = ReedSolomon(ecc_n)
    corrected = []
    n_err_total = 0
    for d, e in zip(datas, eccs):
        dec, ne = rs.decode(d + e)
        if dec is None:
            return None, {"error": "ecc"}
        corrected += dec[: len(d)]
        n_err_total += ne
    # parse byte mode
    bitstream = []
    for c in corrected:
        for i in range(7, -1, -1):
            bitstream.append((c >> i) & 1)

    def take(k):
        nonlocal bitstream
        v = int("".join(map(str, bitstream[:k])), 2)
        bitstream = bitstream[k:]
        return v

    mode = take(4)
    if mode != 0b0100:
        return None, {"error": f"unsupported mode {mode:04b}"}
    count = take(8 if version <= 9 else 16)
    out = bytes(take(8) for _ in range(count))
    return out, {"version": version, "level": level, "mask": mask,
                 "errors_corrected": n_err_total}
