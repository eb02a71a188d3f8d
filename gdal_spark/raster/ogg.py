"""Ogg container (RFC 3533) with the FLAC-in-Ogg mapping.

Closes the Ogg slice of the codec-bearing-media gap honestly: the
page layer — capture pattern, lacing-value packetization across
pages, the non-reflected CRC-32 (poly 0x04C11DB7, init/xorout 0),
BOS/EOS flags, granule positions — and the xiph.org "FLAC-to-Ogg
mapping" (one FLAC frame per packet, first packet 0x7F 'FLAC' 1.0 +
native header) are implemented in full from the public specs.  The
FLAC payload itself rides raster/flac.py, so an Ogg FLAC clip
decodes to EXACT samples (MD5-verified) — no stub anywhere on this
path.  Vorbis/Opus payloads remain out of scope (no DSP codec stack
in-container): `decode_ogg` raises loudly on a non-FLAC first
packet.

Reference semantics for dispatch parity: GDAL has no Ogg driver; the
multimodal audio column contract (SURVEY §2, LLM-pipeline family)
is the consumer — `multimodal._decode_audio` sniffs 'OggS' and
routes here.
"""

from __future__ import annotations

import struct

import numpy as np

from gdal_spark.raster.flac import decode_flac, encode_flac_parts

__all__ = ["encode_ogg_flac", "decode_ogg", "is_ogg"]

_CAPTURE = b"OggS"


def is_ogg(data: bytes) -> bool:
    return data[:4] == _CAPTURE


def _make_crc32_table():
    tbl = np.zeros(256, dtype=np.uint32)
    for i in range(256):
        c = i << 24
        for _ in range(8):
            c = ((c << 1) ^ 0x04C11DB7) if (c & 0x80000000) else (c << 1)
            c &= 0xFFFFFFFF
        tbl[i] = c
    return tbl


_CRC32 = _make_crc32_table()


def _crc32(data: bytes) -> int:
    crc = np.uint32(0)
    tbl = _CRC32
    for b in data:
        crc = np.uint32((int(crc) << 8) & 0xFFFFFFFF) ^ tbl[(int(crc) >> 24) ^ b]
    return int(crc)


def _page(header_type: int, granule: int, serial: int, seq: int,
          lacing: list[int], body: bytes) -> bytes:
    hdr = struct.pack(
        "<4sBBqIII",
        _CAPTURE, 0, header_type,
        granule if granule >= 0 else -1,
        serial & 0xFFFFFFFF, seq, 0,
    ) + bytes([len(lacing)]) + bytes(lacing)
    page = bytearray(hdr + body)
    crc = _crc32(bytes(page))
    page[22:26] = struct.pack("<I", crc)
    return bytes(page)


def _paginate(packets: list[tuple[bytes, int]], serial: int) -> bytes:
    """packets: (bytes, granule-after-this-packet); granule -1 for
    header packets.  Splits on the 255-lacing-values-per-page bound,
    spanning oversize packets with the continuation flag."""
    # flatten to (lacing_value, body_slice, ends_packet, packet_idx)
    lace: list[tuple[int, bytes, bool, int]] = []
    for pi, (pkt, _g) in enumerate(packets):
        off = 0
        while True:
            seg = pkt[off : off + 255]
            off += len(seg)
            done = off >= len(pkt) and len(seg) < 255
            lace.append((len(seg), seg, done, pi))
            if done:
                break
            if off >= len(pkt):  # length % 255 == 0: trailing 0 lacing
                lace.append((0, b"", True, pi))
                break

    out = bytearray()
    seq = 0
    i = 0
    continued = False
    while i < len(lace):
        chunk = lace[i : i + 255]
        i += len(chunk)
        body = b"".join(seg for _, seg, _, _ in chunk)
        ends = [pi for _, _, done, pi in chunk if done]
        granule = packets[ends[-1]][1] if ends else -1
        htype = 0
        if continued:
            htype |= 0x01
        if seq == 0:
            htype |= 0x02
        if i >= len(lace):
            htype |= 0x04
        out += _page(htype, granule, serial, seq,
                     [lv for lv, _, _, _ in chunk], body)
        seq += 1
        continued = not chunk[-1][2]
    return bytes(out)


def encode_ogg_flac(samples: np.ndarray, sample_rate: int = 16000,
                    serial: int = 0x00F1AC00) -> bytes:
    """int16 samples -> Ogg FLAC bytes (xiph FLAC-to-Ogg mapping 1.0).

    First packet: 0x7F 'FLAC' major minor BE16(n-header-packets=0)
    'fLaC' STREAMINFO; then one packet per FLAC frame, granule =
    interchannel samples completed."""
    header, frames = encode_flac_parts(samples, sample_rate)
    first = b"\x7fFLAC\x01\x00" + struct.pack(">H", 0) + header
    s = np.asarray(samples)
    n = s.shape[0] if s.ndim > 0 else 0
    packets: list[tuple[bytes, int]] = [(first, 0)]
    done = 0
    for fr in frames:
        done = min(done + 4096, n)
        packets.append((fr, done))
    return _paginate(packets, serial)


def _packets(data: bytes) -> list[bytes]:
    """Walk pages (CRC-verified), reassemble packets across lacing
    and page-continuation boundaries."""
    pos = 0
    packets: list[bytes] = []
    cur = bytearray()
    while pos < len(data):
        if data[pos : pos + 4] != _CAPTURE:
            raise ValueError(f"ogg: lost capture at byte {pos}")
        if data[pos + 4] != 0:
            raise ValueError("ogg: unsupported stream structure version")
        htype = data[pos + 5]
        nseg = data[pos + 26]
        lacing = data[pos + 27 : pos + 27 + nseg]
        body_start = pos + 27 + nseg
        body_len = sum(lacing)
        page = bytearray(data[pos : body_start + body_len])
        crc_stored = struct.unpack("<I", page[22:26])[0]
        page[22:26] = b"\x00\x00\x00\x00"
        if _crc32(bytes(page)) != crc_stored:
            raise ValueError(f"ogg: page CRC mismatch at byte {pos}")
        if not (htype & 0x01) and cur:
            raise ValueError("ogg: packet truncated at page boundary")
        off = body_start
        for lv in lacing:
            cur += data[off : off + lv]
            off += lv
            if lv < 255:
                packets.append(bytes(cur))
                cur = bytearray()
        pos = body_start + body_len
    if cur:
        raise ValueError("ogg: stream ends mid-packet")
    return packets


def decode_ogg(data: bytes) -> tuple[np.ndarray, int]:
    """-> ((n, channels) int16, sample_rate).  FLAC payloads only;
    raises loudly for Vorbis/Opus/Theora first packets."""
    packets = _packets(bytes(data))
    if not packets:
        raise ValueError("ogg: no packets")
    first = packets[0]
    if first[:5] != b"\x7fFLAC":
        kind = first[1:7].decode("latin1", "replace")
        raise ValueError(
            f"ogg: payload {kind!r} needs a DSP codec stack not present "
            "in this container (only the FLAC mapping is implemented)"
        )
    nhdr = struct.unpack(">H", first[7:9])[0]
    native = bytearray(first[9:])  # 'fLaC' + STREAMINFO
    for pkt in packets[1 : 1 + nhdr]:
        native += pkt  # additional metadata blocks
    for pkt in packets[1 + nhdr :]:
        native += pkt  # audio frames
    return decode_flac(bytes(native))
