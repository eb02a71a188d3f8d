"""MP4 / ISO base-media (ISO/IEC 14496-12) video container — pure
struct/numpy, no codec stack.  Closes the "MP4" slice of the
codec-bearing-media gap for the two codecs this container can carry
honestly:

- ``raw ``: the QuickTime uncompressed-RGB video sample entry
  (QTFF "Uncompressed Y'CbCr/RGB" family, depth 24): tightly-packed
  top-down RGB triplets, no row padding — pixel-EXACT, so the driver
  oracle closes in SQL like the AVI DIB path.
- ``jpeg``: QuickTime Motion-JPEG — each sample is one complete
  baseline JPEG image, decoded by the repo's own from-scratch codec
  (raster/jpeg.py).  Lossy: the parity criterion is the BASELINE.json
  PSNR >= 40 dB rule, same as still JPEG and MJPG AVI.

H.264/H.265/AV1 samples remain genuinely undecodable here (no codec
stack ships in-container) and raise loudly.

Box grammar implemented from the public ISO 14496-12 layout: big-endian
[size:u32][type:4cc] framing with size==1 -> 64-bit largesize and
size==0 -> to-EOF; container boxes moov/trak/mdia/minf/stbl/dinf/edts;
the sample-table walk is the real stsc run-length chunk map (first_chunk
runs expanded over the stco chunk list, per-chunk sample offsets by
stsz prefix sums), NOT a one-chunk shortcut — the writer deliberately
emits multi-sample chunks of 3 so the reader's mapping is exercised.

Reference parallel: GDAL has no MP4 driver; the dispatch model mirrored
here is the magic-byte identify loop (gcore/gdaldataset.cpp:3809-3862),
and the frame-stats contract matches raster/avi.py.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_mp4", "decode_mp4", "is_mp4"]

_CHUNK_SAMPLES = 3  # writer packs up to 3 frames per chunk (exercises stsc)


def is_mp4(data: bytes) -> bool:
    return len(data) >= 12 and data[4:8] == b"ftyp"


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I4s", 8 + len(payload), btype) + payload


def _full(btype: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(btype, struct.pack(">B3s", version, flags.to_bytes(3, "big")) + payload)


_MATRIX = struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)


def _visual_sample_entry(fourcc: bytes, w: int, h: int, name: bytes) -> bytes:
    """ISO 14496-12 VisualSampleEntry (the fixed 78-byte body)."""
    comp = bytes([len(name)]) + name
    comp = comp[:32].ljust(32, b"\x00")  # pascal compressorname, 32 bytes
    body = (
        b"\x00" * 6                      # reserved
        + struct.pack(">H", 1)           # data_reference_index
        + struct.pack(">HH", 0, 0)       # pre_defined, reserved
        + struct.pack(">3I", 0, 0, 0)    # pre_defined[3]
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0)           # reserved
        + struct.pack(">H", 1)           # frame_count
        + comp
        + struct.pack(">Hh", 24, -1)     # depth, pre_defined
    )
    return _box(fourcc, body)


def encode_mp4(frames: np.ndarray, fps: int = 25, codec: str = "raw ",
               quality: int = 90) -> bytes:
    """frames: (n, h, w, 3) uint8 RGB -> ISO BMFF bytes.

    codec="raw " writes tightly-packed top-down RGB24 samples;
    codec="jpeg" writes one baseline JPEG per sample (raster/jpeg.py).
    Layout: ftyp + mdat + trailing moov (stco holds absolute file
    offsets into mdat, known once ftyp/mdat sizes are fixed)."""
    frames = np.asarray(frames, dtype=np.uint8)
    n, h, w, _ = frames.shape
    if codec == "raw ":
        payloads = [frames[k].tobytes() for k in range(n)]
        fourcc, comp_name = b"raw ", b"Uncompressed RGB"
    elif codec == "jpeg":
        from gdal_spark.raster.jpeg import encode_jpeg

        payloads = [encode_jpeg(frames[k], quality) for k in range(n)]
        fourcc, comp_name = b"jpeg", b"Motion-JPEG"
    else:
        raise ValueError(f"mp4 codec: unsupported codec {codec!r}")

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isommp41")
    mdat = _box(b"mdat", b"".join(payloads))

    # chunking: up to _CHUNK_SAMPLES samples per chunk
    chunk_sizes = []  # samples per chunk
    k = 0
    while k < n:
        chunk_sizes.append(min(_CHUNK_SAMPLES, n - k))
        k += chunk_sizes[-1]
    offsets, pos, si = [], len(ftyp) + 8, 0
    for cs in chunk_sizes:
        offsets.append(pos)
        pos += sum(len(payloads[si + j]) for j in range(cs))
        si += cs

    # stsc: run-length (first_chunk, samples_per_chunk, desc_index)
    stsc_entries = []
    for ci, cs in enumerate(chunk_sizes):
        if not stsc_entries or stsc_entries[-1][1] != cs:
            stsc_entries.append((ci + 1, cs, 1))

    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1)
                 + _visual_sample_entry(fourcc, w, h, comp_name))
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, 1))
    stsc = _full(b"stsc", 0, 0, struct.pack(">I", len(stsc_entries))
                 + b"".join(struct.pack(">III", *e) for e in stsc_entries))
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, n)
                 + b"".join(struct.pack(">I", len(p)) for p in payloads))
    stco = _full(b"stco", 0, 0, struct.pack(">I", len(offsets))
                 + b"".join(struct.pack(">I", o) for o in offsets))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)

    url_ = _full(b"url ", 0, 1, b"")  # flag 1: data in this file
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + url_)
    dinf = _box(b"dinf", dref)
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">4H", 0, 0, 0, 0))
    minf = _box(b"minf", vmhd + dinf + stbl)

    mdhd = _full(b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, fps, n, 0x55C4, 0))
    hdlr = _full(b"hdlr", 0, 0, struct.pack(">I4s3I", 0, b"vide", 0, 0, 0)
                 + b"VideoHandler\x00")
    mdia = _box(b"mdia", mdhd + hdlr + minf)

    tkhd = _full(b"tkhd", 0, 7, struct.pack(">IIIII", 0, 0, 1, 0, n)
                 + struct.pack(">IIHHHH", 0, 0, 0, 0, 0, 0) + _MATRIX
                 + struct.pack(">II", w << 16, h << 16))
    trak = _box(b"trak", tkhd + mdia)

    mvhd = _full(b"mvhd", 0, 0, struct.pack(">IIII", 0, 0, fps, n)
                 + struct.pack(">IHH", 0x00010000, 0x0100, 0)
                 + struct.pack(">II", 0, 0) + _MATRIX
                 + struct.pack(">6I", 0, 0, 0, 0, 0, 0)
                 + struct.pack(">I", 2))
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"dinf", b"edts"}


def _walk(data: bytes, off: int, end: int, path: tuple, found: dict) -> None:
    while off + 8 <= end:
        size, btype = struct.unpack_from(">I4s", data, off)
        body = off + 8
        if size == 1:  # 64-bit largesize
            (size,) = struct.unpack_from(">Q", data, body)
            body += 8
            nxt = off + size
        elif size == 0:  # to end of enclosing scope
            nxt = end
        else:
            nxt = off + size
        if nxt > end or nxt <= off:
            raise ValueError(f"mp4: bad box size at offset {off}")
        if btype in _CONTAINERS:
            _walk(data, body, nxt, path + (btype,), found)
        else:
            found.setdefault(path + (btype,), []).append((body, nxt))
        off = nxt


def _u32s(data: bytes, off: int, n: int) -> list[int]:
    return list(struct.unpack_from(f">{n}I", data, off))


def decode_mp4(data: bytes) -> tuple[np.ndarray, int]:
    """-> ((n, h, w, 3) uint8 RGB frames, fps).  Selects the 'vide'
    handler trak (audio/other traks skipped, whatever their order),
    expands the real stsc chunk map, and decodes raw-RGB or JPEG
    samples."""
    if not is_mp4(data):
        raise ValueError("not an ISO BMFF payload")
    found: dict = {}
    _walk(data, 0, len(data), (), found)

    # pick the video trak: group leaf hits by trak ordinal
    def trak_tables(idx: int, leaf: bytes, root: bytes = b"stbl"):
        key = {
            b"hdlr": (b"moov", b"trak", b"mdia", b"hdlr"),
            b"mdhd": (b"moov", b"trak", b"mdia", b"mdhd"),
        }.get(leaf, (b"moov", b"trak", b"mdia", b"minf", b"stbl", leaf))
        hits = found.get(key, [])
        return hits[idx] if idx < len(hits) else None

    hdlrs = found.get((b"moov", b"trak", b"mdia", b"hdlr"), [])
    vide = None
    for i, (b0, _b1) in enumerate(hdlrs):
        if data[b0 + 8 : b0 + 12] == b"vide":
            vide = i
            break
    if vide is None:
        raise ValueError("mp4: no video trak")

    b0, _ = trak_tables(vide, b"mdhd")
    timescale, n_dur = struct.unpack_from(">II", data, b0 + 12)

    b0, b1 = trak_tables(vide, b"stsd")
    fourcc = data[b0 + 12 : b0 + 16]
    # entry body starts at b0+16 (stsd FullBox 4 + entry_count 4 +
    # entry size 4 + fourcc 4); width sits 24 bytes in (reserved 6 +
    # dri 2 + pre_defined 2 + reserved 2 + pre_defined[3] 12)
    w, h = struct.unpack_from(">HH", data, b0 + 16 + 24)

    b0, _ = trak_tables(vide, b"stts")
    (n_stts,) = struct.unpack_from(">I", data, b0 + 4)
    first_delta = struct.unpack_from(">II", data, b0 + 8)[1] if n_stts else 1

    b0, _ = trak_tables(vide, b"stsz")
    sample_size, n = struct.unpack_from(">II", data, b0 + 4)
    sizes = ([sample_size] * n if sample_size
             else _u32s(data, b0 + 12, n))

    co = trak_tables(vide, b"stco")
    if co is not None:
        (n_chunks,) = struct.unpack_from(">I", data, co[0] + 4)
        chunk_offs = _u32s(data, co[0] + 8, n_chunks)
    else:  # co64
        co = trak_tables(vide, b"co64")
        if co is None:
            raise ValueError("mp4: no stco/co64")
        (n_chunks,) = struct.unpack_from(">I", data, co[0] + 4)
        chunk_offs = list(struct.unpack_from(f">{n_chunks}Q", data, co[0] + 8))

    b0, _ = trak_tables(vide, b"stsc")
    (n_runs,) = struct.unpack_from(">I", data, b0 + 4)
    runs = [struct.unpack_from(">III", data, b0 + 8 + 12 * i) for i in range(n_runs)]

    # expand stsc: samples-per-chunk for each chunk 1..n_chunks
    per_chunk = []
    for ri, (first, spc, _desc) in enumerate(runs):
        last = runs[ri + 1][0] - 1 if ri + 1 < len(runs) else n_chunks
        per_chunk.extend([spc] * (last - first + 1))

    payloads, si = [], 0
    for ci, spc in enumerate(per_chunk):
        pos = chunk_offs[ci]
        for _ in range(spc):
            if si >= n:
                break
            payloads.append(data[pos : pos + sizes[si]])
            pos += sizes[si]
            si += 1
    if si != n:
        raise ValueError(f"mp4: stsc map yields {si} samples, stsz says {n}")

    fps = int(round(timescale / max(1, first_delta)))
    if fourcc == b"raw ":
        out = np.empty((n, h, w, 3), dtype=np.uint8)
        for k, p in enumerate(payloads):
            out[k] = np.frombuffer(p, dtype=np.uint8, count=h * w * 3).reshape(h, w, 3)
        return out, fps
    if fourcc in (b"jpeg", b"mjpa", b"MJPG"):
        from gdal_spark.raster.jpeg import decode_jpeg

        out = np.empty((n, h, w, 3), dtype=np.uint8)
        for k, p in enumerate(payloads):
            img = decode_jpeg(bytes(p))
            if img.shape != (h, w, 3):
                raise ValueError(f"mp4 jpeg sample {k}: {img.shape} != ({h}, {w}, 3)")
            out[k] = img
        return out, fps
    raise ValueError(f"mp4: no in-container codec for sample entry {fourcc!r} "
                     "(raw /jpeg only — H.26x/AV1 need an external codec stack)")
