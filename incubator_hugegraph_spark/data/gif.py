"""GIF codec in pure Python (r06 verdict item 5, optional follow-on).

The LZW leg of the codec-bound tier: a real GIF89a encoder/decoder
pair — genuine variable-width LZW with clear/EOI codes and 4096-entry
dictionary growth, sub-block framing, logical screen descriptor and
color tables parsed from the stream. GIF is LOSSLESS for paletted
data, so unlike JPEG the oracle needs no special fixture geometry:
any image whose colors fit the palette round-trips bit-for-bit.

Scope (documented): GIF87a/89a with a global or local color table,
non-interlaced or interlaced (r08 — four-pass Appendix E row
scatter). `decode_gif_rgb` returns the FIRST frame (the still-image
contract of the decode_image_rgb dispatch); `decode_gif_frames`
(r08) decodes ANIMATIONS — per-frame LZW, sub-rectangle compositing
at (left, top), transparent-index passthrough, disposal 0/1/2 and
(r09) 3 (restore-to-previous) — returning one logical-screen
snapshot per image block (the AVI frames contract, so the same
dHash kernels apply). The shared None-not-raise contract of
decode_png_rgb / decode_jpeg_rgb applies to malformed streams.

Reference behavior parity: none — the reference (hugegraph) has no
media tier; this module serves the training-data-pipeline brief.
"""

from __future__ import annotations

import struct


def _lzw_compress(indices, min_code_size: int) -> bytes:
    """GIF-variant LZW: emit CLEAR, build the string table up to
    4095, re-CLEAR when full, finish with EOI. Variable code width
    grows at 2^width, capped at 12 bits. LSB-first bit packing."""
    clear = 1 << min_code_size
    eoi = clear + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh_table():
        return {(i,): i for i in range(clear)}

    table = fresh_table()
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    prefix: tuple = ()
    for v in indices:
        cand = prefix + (int(v),)
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix], width)
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code >= 4096:
            emit(clear, width)
            table = fresh_table()
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = (int(v),)
    if prefix:
        emit(table[prefix], width)
        # the decoder APPENDS a table entry for this final code too
        # (its appends lag our adds by one emit) — if that append
        # lands exactly on the 2^width boundary the decoder grows the
        # code width before reading EOI, so EOI must be written at
        # the grown width (review r07: a byte-aligned stream whose
        # final data code hit the 512-entry boundary lost its EOI and
        # decoded to None; zero-padding masked every other case)
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decompress(data: bytes, min_code_size: int,
                    max_out: int | None = None) -> bytearray:
    """Inverse of _lzw_compress per the GIF spec (incl. the KwKwK
    case: a code one past the table end copies prev + prev[0]).
    ``max_out`` stops decompression once that many bytes are out —
    callers know the pixel count, and without the bound a crafted
    stream could inflate far past it before the caller's dims check
    (r08 review: None-contract hardening, not a spec deviation —
    trailing data after the pixel area is ignored anyway)."""
    clear = 1 << min_code_size
    eoi = clear + 1

    pos = 0

    def read(width: int) -> int:
        nonlocal pos
        v = 0
        for k in range(width):
            byte_i, bit_i = divmod(pos, 8)
            if byte_i >= len(data):
                raise ValueError("gif: LZW data exhausted")
            v |= ((data[byte_i] >> bit_i) & 1) << k
            pos += 1
        return v

    out = bytearray()
    table: list[bytes] = []
    width = min_code_size + 1
    prev: bytes | None = None

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        prev = None

    reset()
    while True:
        if max_out is not None and len(out) >= max_out:
            return out
        code = read(width)
        if code == clear:
            reset()
            continue
        if code == eoi:
            return out
        if prev is None:
            if code >= len(table):
                raise ValueError("gif: bad first code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]  # KwKwK
            table.append(entry)
        else:
            raise ValueError("gif: code beyond table")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1


def _sub_blocks(data: bytes) -> bytes:
    """Frame `data` into <=255-byte GIF sub-blocks + terminator."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _read_sub_blocks(b: bytes, i: int):
    """Collect sub-block payloads from offset i; returns (data, next
    offset past the terminator)."""
    out = bytearray()
    while True:
        if i >= len(b):
            raise ValueError("gif: unterminated sub-blocks")
        n = b[i]
        i += 1
        if n == 0:
            return bytes(out), i
        out += b[i:i + n]
        if len(b) < i + n:
            raise ValueError("gif: truncated sub-block")
        i += n


def _interlace_order(height: int) -> list[int]:
    """GIF89a Appendix E interlace row sequence: pass 1 rows 0,8,16…,
    pass 2 rows 4,12…, pass 3 rows 2,6,10…, pass 4 odd rows. The
    stream stores rows in THIS order; display order is 0..height-1."""
    return (list(range(0, height, 8)) + list(range(4, height, 8))
            + list(range(2, height, 4)) + list(range(1, height, 2)))


def encode_gif_gray(gray: bytes, width: int, height: int,
                    interlace: bool = False) -> bytes:
    """REAL GIF89a encoder for 8-bit grayscale: a 256-entry global
    color table with palette[i] = (i, i, i), one image whose pixel
    indices ARE the gray values, genuine LZW. ``interlace`` stores
    rows in the four-pass Appendix E order with the interlace flag
    set (r08). Lossless either way: decode returns exactly `gray`
    replicated to RGB."""
    assert len(gray) == width * height
    lsd = struct.pack("<HHBBB", width, height,
                      0x80 | 0x70 | 0x07,  # GCT, 8-bit color, 256 ent.
                      0, 0)
    palette = bytes(v for i in range(256) for v in (i, i, i))
    img_desc = b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height,
                                     0x40 if interlace else 0)
    if interlace:
        rows = _interlace_order(height)
        gray = b"".join(gray[r * width:(r + 1) * width] for r in rows)
    lzw = _lzw_compress(gray, 8)
    return (b"GIF89a" + lsd + palette + img_desc + bytes([8])
            + _sub_blocks(lzw) + b"\x3b")


# envelope bound on decoded pixel counts (r08 review): header-lie
# streams (tiny bytes, 65535x65535 claimed dims) must map to None,
# not a multi-GB allocation / MemoryError escaping the None contract
MAX_PIXELS = 1 << 24  # 16.7M px — a 4096x4096 frame

# cumulative bound across an ANIMATION (r09 review): every image
# block costs w*h index bytes at parse plus a full sw*sh*3 canvas
# snapshot at composite, so forty 1x1 blocks on a 2048x2048 screen
# would decode ~500 MB without a cumulative cap — linear to executor
# OOM from a ~100 KB crafted stream. The parse walk charges
# w*h + sw*sh per image block against this budget and rejects BEFORE
# any canvas allocation; past it the stream maps to None. 2x
# MAX_PIXELS so a single max-size still (which charges w*h == sw*sh
# == MAX_PIXELS once) stays inside the r08 envelope; composited
# frame bytes are bounded at <= ~100 MB, same order as one max-size
# decoded PNG.
MAX_TOTAL_PIXELS = 2 * MAX_PIXELS


def _gif_blocks(b: bytes, max_images: int | None = None):
    """Parse a GIF stream into (screen w, screen h, background
    index, global palette, images) — the shared walk under
    decode_gif_rgb (max_images=1) and decode_gif_frames (animation,
    r08). Each image is (x, y, w, h, palette, gce, index bytearray)
    with interlaced rows already scattered to display order; gce is
    the Graphic Control Extension state (disposal, transparent
    index) in force for that image, or None. Raises on malformed
    input — the public doors catch and return None."""
    if len(b) < 13 or b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("gif: bad signature")
    sw, sh, flags, bg, _ar = struct.unpack("<HHBBB", b[6:13])
    i = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = b[i:i + 3 * n]
        if len(gct) < 3 * n:
            raise ValueError("gif: truncated GCT")
        i += 3 * n
    images = []
    gce = None
    total_px = 0  # cumulative w*h + sw*sh budget (r09: OOM cap)
    while i < len(b):
        block = b[i]
        if block == 0x21:  # extension
            label = b[i + 1] if i + 1 < len(b) else 0
            data, i = _read_sub_blocks(b, i + 2)
            if label == 0xF9 and len(data) >= 4:
                packed = data[0]
                gce = {"disposal": (packed >> 2) & 0x07,
                       "transparent": data[3]
                       if packed & 0x01 else None}
        elif block == 0x2C:  # image descriptor
            x, y, w, h, iflags = struct.unpack("<HHHHB",
                                               b[i + 1:i + 10])
            i += 10
            pal = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                pal = b[i:i + 3 * n]
                if len(pal) < 3 * n:
                    raise ValueError("gif: truncated LCT")
                i += 3 * n
            if pal is None or w < 1 or h < 1 or w * h > MAX_PIXELS:
                raise ValueError("gif: no palette / bad dims")
            # charge this block's index bytes AND — on the ANIMATION
            # walk only — its eventual sw*sh canvas snapshot against
            # the cumulative budget BEFORE decoding (r09 review: many
            # tiny blocks on a huge logical screen must not
            # out-allocate the per-frame dims check). The still path
            # (max_images=1) never materializes the screen canvas,
            # so a large DECLARED screen must not reject a small
            # first image there (second r09 review wave). Past the
            # budget the walk TRUNCATES — returns the frames already
            # decoded — instead of rejecting the stream (third r09
            # wave: a legitimate ~35-frame 800x600 animation must
            # not regress to None; partial frames still feed the
            # near-dup index, while the crafted
            # forty-1x1-blocks-on-2048x2048 stream is cut off after
            # ~8 frames, bounding composited output at ~100 MB).
            total_px += w * h + (sw * sh if max_images is None else 0)
            if total_px > MAX_TOTAL_PIXELS:
                if images:
                    break
                raise ValueError("gif: cumulative output cap")
            min_code = b[i]
            i += 1
            lzw, i = _read_sub_blocks(b, i)
            # cap the inflation at the pixels we need — a crafted
            # LZW bomb must not out-allocate the dims check
            idx = _lzw_decompress(lzw, min_code, max_out=w * h)
            if len(idx) < w * h:
                raise ValueError("gif: short pixel data")
            if iflags & 0x40:
                de = bytearray(w * h)
                for src, dst in enumerate(_interlace_order(h)):
                    de[dst * w:(dst + 1) * w] = \
                        idx[src * w:(src + 1) * w]
                idx = de
            images.append((x, y, w, h, pal, gce, idx))
            gce = None  # a GCE governs exactly one rendering block
            if max_images is not None and len(images) >= max_images:
                break
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError("gif: unknown block")
    return sw, sh, bg, gct, images


def decode_gif_frames(b: bytes):
    """REAL animated-GIF frame decode (r08): every image block is
    LZW-decoded and COMPOSITED onto the logical screen the way a
    viewer renders it — sub-rectangle placement at (left, top),
    transparent-index pixels leaving the canvas unchanged, disposal
    0/1 (leave in place), 2 (restore the region to the background
    color) and 3 (restore the whole canvas to its pre-draw state,
    r09). Returns (width, height, [row-major RGB frame bytes]) —
    one canvas snapshot per image block — or None for malformed
    streams. Animations whose cumulative output exceeds
    MAX_TOTAL_PIXELS TRUNCATE to the frames inside the budget (r09:
    bounded decode cost for crafted many-block streams without
    rejecting ordinary long animations to None). Feed the frames to
    the same dHash kernels the AVI path uses."""
    import numpy as np
    try:
        sw, sh, bg, gct, images = _gif_blocks(b)
        if not images or sw < 1 or sh < 1 or sw * sh > MAX_PIXELS:
            return None
        bg_rgb = gct[3 * bg:3 * bg + 3] if gct is not None \
            and 3 * bg + 3 <= len(gct) else b"\x00\x00\x00"
        canvas = np.empty((sh, sw, 3), dtype=np.uint8)
        canvas[:] = np.frombuffer(bg_rgb, np.uint8)
        frames = []
        for x, y, w, h, pal, gce, idx in images:
            disposal = gce["disposal"] if gce else 0
            transparent = gce["transparent"] if gce else None
            if disposal > 3:
                return None  # 4..7 are reserved in GIF89a
            if x + w > sw or y + h > sh:
                return None
            # disposal 3 = restore-to-previous (r09): snapshot the
            # canvas BEFORE this frame draws; after emitting the
            # composited frame, the canvas reverts so the next frame
            # composes over the pre-draw state (GIF89a §23(iv))
            before = canvas.copy() if disposal == 3 else None
            # vectorized compositing (r08 review: the per-pixel
            # Python loop cost O(frames*w*h) interpreter iterations
            # on the Spark video path): palette gather in one shot,
            # transparent pixels masked out of the scatter
            pidx = np.frombuffer(bytes(idx[:w * h]),
                                 np.uint8).reshape(h, w)
            npal = len(pal) // 3
            if int(pidx.max()) >= npal:
                return None
            rgb = np.frombuffer(pal, np.uint8)[:3 * npal] \
                .reshape(npal, 3)[pidx]
            region = canvas[y:y + h, x:x + w]
            if transparent is None:
                region[:] = rgb
            else:
                mask = pidx != transparent
                region[mask] = rgb[mask]
            frames.append(canvas.tobytes())
            if disposal == 2:
                region[:] = np.frombuffer(bg_rgb, np.uint8)
            elif disposal == 3:
                canvas = before
        return sw, sh, frames
    except (ValueError, struct.error, IndexError):
        return None


def encode_gif_gray_frames(frames: list[bytes], width: int,
                           height: int,
                           delay_cs: int = 4,
                           disposals: list[int] | None = None,
                           bg: int = 0,
                           transparents: list[int | None] | None
                           = None) -> bytes:
    """REAL animated GIF89a writer: full-screen grayscale frames,
    one GCE per image block (``disposals[i]`` or disposal=1,
    ``transparents[i]`` or no transparency, ``delay_cs``
    hundredths), background index ``bg``, shared 256-entry gray
    global palette, genuine LZW per frame — THE fixture writer of
    decode_gif_frames (r09 review: a second hand-rolled writer in
    multimodal.py drifted from this one; keep exactly one)."""
    assert all(len(f) == width * height for f in frames)
    lsd = struct.pack("<HHBBB", width, height, 0x80 | 0x70 | 0x07,
                      bg, 0)
    palette = bytes(v for i in range(256) for v in (i, i, i))
    out = bytearray(b"GIF89a" + lsd + palette)
    for fi, f in enumerate(frames):
        disp = disposals[fi] if disposals is not None else 1
        tr = transparents[fi] if transparents is not None else None
        packed = disp << 2 | (1 if tr is not None else 0)
        out += (b"\x21\xf9\x04" + bytes([packed])
                + struct.pack("<H", delay_cs)
                + bytes([tr or 0]) + b"\x00")
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
        out += bytes([8]) + _sub_blocks(_lzw_compress(f, 8))
    out += b"\x3b"
    return bytes(out)


def decode_gif_rgb(b: bytes):
    """REAL GIF still-image decode — the FIRST image block of the
    stream (the decode_image_rgb contract; animations get every
    composited frame via decode_gif_frames): logical screen
    descriptor, global/local color table, extension skipping, LZW
    decompress, deinterlace when flagged (r08), vectorized palette
    lookup. Returns (width, height, bytearray of row-major RGB) or
    None for malformed streams — the shared None-not-raise contract.
    A thin adapter over the _gif_blocks walk (r08 review: the walk
    previously existed twice, drifting was only a matter of time)."""
    import numpy as np
    try:
        _sw, _sh, _bg, _gct, images = _gif_blocks(b, max_images=1)
        if not images:
            return None
        _x, _y, w, h, pal, _gce, idx = images[0]
        pidx = np.frombuffer(bytes(idx[:w * h]), np.uint8)
        npal = len(pal) // 3
        if int(pidx.max()) >= npal:
            return None
        rgb = np.frombuffer(pal, np.uint8)[:3 * npal] \
            .reshape(npal, 3)[pidx]
        return w, h, bytearray(rgb.tobytes())
    except (ValueError, struct.error, IndexError):
        return None
