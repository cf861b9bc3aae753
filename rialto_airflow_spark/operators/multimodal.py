"""Multimodal column operators: image/audio/video as opaque binary
columns with typed metadata, processed in Arrow batches.

Design (the part that matters at 100 TB): binary payloads ride in
parquet binary columns next to their metadata; all per-item compute
runs through mapInPandas so Arrow moves whole batches across the
Python boundary once, and partitioning is by content hash so skewed
producers don't hot-spot an executor. The decode step itself is
STUBBED here (no image/audio libraries in this container) behind
``NotImplementedError`` / deterministic fakes — the Spark-side
plumbing (schema, batch shape, UDF signature, partitioning) is real
and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# metadata carried alongside every binary payload
MEDIA_META_DDL = (
    "media_id bigint, kind string, content binary, n_bytes long, "
    "content_md5 string"
)

FEATURE_DDL = (
    "media_id bigint, kind string, n_bytes long, content_md5 string, "
    "magic_int long, feature string"
)


def attach_binary(df: DataFrame, id_col: str, payload_col: str, kind: str) -> DataFrame:
    """Wrap a payload column as an opaque binary media column with
    typed metadata (id, kind, byte length, content hash). For real
    media the payload arrives as bytes from the source; here any
    string column can stand in (encoded utf-8)."""
    content = F.col(payload_col).cast("binary")
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit(kind).alias("kind"),
        content.alias("content"),
        F.length(content).cast("long").alias("n_bytes"),
        F.md5(content).alias("content_md5"),
    )


def decode_media(content: bytes, kind: str) -> dict:
    """STUB — the real decoder (PIL/ffmpeg/soundfile) is not in this
    container. Deterministic fake: 'decodes' to the first 8 bytes as
    a big-endian int plus a synthetic feature tag. Raises for kinds
    that would need a true codec path."""
    if kind not in ("image", "audio", "video", "text"):
        raise NotImplementedError(f"no decoder for kind={kind}")
    magic = int.from_bytes(content[:8].ljust(8, b"\0"), "big", signed=False) >> 1
    return {"magic_int": magic, "feature": f"{kind}:{hashlib.md5(content).hexdigest()[:8]}"}


def decode_wav(content: bytes) -> dict:
    """REAL pure-stdlib audio decode for PCM WAV (RIFF chunk walk via
    ``struct`` — no codec library): format fields from the ``fmt ``
    chunk, duration from the ``data`` chunk, and peak amplitude
    actually computed over the samples (8-bit unsigned / 16-bit
    signed PCM). Round-10 answer to 'exercise one decoder path with
    real bytes': WAV and BMP parse from the standard library alone,
    so one audio and one image modality run end-to-end without the
    injected-fake seam (which stays in place for codecs the container
    lacks)."""
    import struct

    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(content):
        cid, size = content[pos:pos + 4], struct.unpack(
            "<I", content[pos + 4:pos + 8]
        )[0]
        body = content[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _brate, _align, bits = fmt
    if audio_format != 1:
        raise ValueError(f"only PCM WAV supported (format={audio_format})")
    if bits == 16:
        n = len(data) // 2
        samples = struct.unpack(f"<{n}h", data[: n * 2])
        peak = max((abs(s) for s in samples), default=0)
    elif bits == 8:
        peak = max((abs(b - 128) for b in data), default=0)
        n = len(data)
    else:
        raise ValueError(f"unsupported PCM width {bits}")
    n_samples = n // max(n_channels, 1)
    return {
        "format": "wav",
        "n_channels": n_channels,
        "sample_rate": sample_rate,
        "bits": bits,
        "n_samples": n_samples,
        "duration_s": n_samples / sample_rate if sample_rate else 0.0,
        "peak": peak,
    }


def decode_bmp(content: bytes) -> dict:
    """REAL pure-stdlib image decode for uncompressed 24-bit BMP
    (BITMAPINFOHEADER, BI_RGB): dimensions from the DIB header and
    mean R/G/B actually computed over the pixel array (bottom-up rows,
    4-byte padded) — see :func:`decode_wav` for why these two formats
    get real decoders."""
    import struct

    if len(content) < 54 or content[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pix_off = struct.unpack("<I", content[10:14])[0]
    hdr_size, width, height, _planes, bpp, compression = struct.unpack(
        "<IiiHHI", content[14:34]
    )
    if hdr_size < 40 or compression != 0 or bpp != 24:
        raise ValueError("only uncompressed 24-bit BMP supported")
    bottom_up = height > 0
    height = abs(height)
    row_bytes = (width * 3 + 3) & ~3
    tot_r = tot_g = tot_b = 0
    for row in range(height):
        src = row if not bottom_up else height - 1 - row
        base = pix_off + src * row_bytes
        line = content[base:base + width * 3]
        # pixels are little-endian BGR triples
        tot_b += sum(line[0::3])
        tot_g += sum(line[1::3])
        tot_r += sum(line[2::3])
    n_px = max(width * height, 1)
    return {
        "format": "bmp",
        "width": width,
        "height": height,
        "bpp": bpp,
        "mean_r": tot_r / n_px,
        "mean_g": tot_g / n_px,
        "mean_b": tot_b / n_px,
    }


PNG_SIG = b"\x89PNG\r\n\x1a\n"


def decode_png(content: bytes) -> dict:
    """REAL pure-stdlib decode for 8-bit PNG (round-12 task #4 — the
    first COMPRESSED codec through the real-decoder contract): chunk
    walk, ``zlib`` inflate of the concatenated IDAT stream, and full
    scanline reconstruction of all five PNG filter types (None / Sub /
    Up / Average / Paeth — RFC 2083 §6) for color types 0 (gray),
    2 (RGB), 4 (gray+alpha) and 6 (RGBA), non-interlaced. Dimensions
    from IHDR; mean R/G/B computed over the RECONSTRUCTED pixels, so a
    wrong filter implementation shows up as wrong means, not just a
    size check."""
    import struct
    import zlib

    if len(content) < 8 or content[:8] != PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat, ihdr = 8, b"", None
    while pos + 8 <= len(content):
        size, cid = struct.unpack(">I4s", content[pos:pos + 8])
        body = content[pos + 8:pos + 8 + size]
        if cid == b"IHDR":
            if len(body) < 13:
                raise ValueError("PNG IHDR chunk truncated")
            ihdr = struct.unpack(">IIBBBBB", body[:13])
        elif cid == b"IDAT":
            idat += body
        elif cid == b"IEND":
            break
        pos += 8 + size + 4  # chunk CRC trails the body
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT chunk")
    width, height, depth, color, comp, filt, interlace = ihdr
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
    if depth != 8 or channels is None or comp != 0 or filt != 0:
        raise ValueError(
            f"only 8-bit gray/RGB/RGBA PNG supported "
            f"(depth={depth}, color={color})"
        )
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    try:
        raw = zlib.decompress(idat)
    except zlib.error as e:
        # keep the sibling decoders' malformed-payload contract: a
        # corrupt blob is a bad PAYLOAD (ValueError), not an
        # infrastructure error crashing the executor task
        raise ValueError(f"PNG IDAT stream corrupt: {e}") from e
    stride = width * channels
    if len(raw) < (stride + 1) * height:
        raise ValueError("PNG pixel data truncated")
    prev = bytearray(stride)
    tot = [0, 0, 0, 0]
    for row in range(height):
        base = row * (stride + 1)
        ftype = raw[base]
        line = bytearray(raw[base + 1:base + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                b = prev[i]
                c = prev[i - channels] if i >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter type {ftype}")
        for ch in range(channels):
            tot[ch] += sum(line[ch::channels])
        prev = line
    n_px = max(width * height, 1)
    means = [t / n_px for t in tot]
    if color in (0, 4):  # gray(-alpha): replicate luma across RGB
        mean_r = mean_g = mean_b = means[0]
    else:
        mean_r, mean_g, mean_b = means[0], means[1], means[2]
    return {
        "format": "png",
        "width": width,
        "height": height,
        "channels": channels,
        "mean_r": mean_r,
        "mean_g": mean_g,
        "mean_b": mean_b,
    }


GIF_SIGS = (b"GIF87a", b"GIF89a")


def _gif_lzw(min_code: int, data: bytes, n_pixels: int) -> bytearray:
    """GIF-variant LZW decompression (LSB-first variable-width codes,
    clear/end codes, deferred width growth to 12 bits, the KwKwK
    self-referential case). Raises ``ValueError`` on a code outside
    the table — corrupt payload, not infrastructure."""
    clear = 1 << min_code
    end = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code + 1
    out = bytearray()
    acc = nbits = pos = 0
    prev: bytes | None = None
    while len(out) < n_pixels:
        while nbits < width and pos < len(data):
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        if nbits < width:
            break  # stream exhausted
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= clear:
                raise ValueError("GIF LZW stream starts with non-literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK: the just-about-to-be-added code
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"GIF LZW code {code} outside table")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    return out


def decode_gif(content: bytes) -> dict:
    """REAL pure-stdlib decode for GIF87a/89a — the second COMPRESSED
    codec family through the real-decoder contract (LZW, where PNG is
    DEFLATE): logical-screen + image descriptors, global/local color
    tables, block-chained LZW decompression of the FIRST frame,
    interlace de-weave (the 8/8/4/2 four-pass order), and mean R/G/B
    over the palette-RESOLVED pixels, so a wrong code-width bump
    shows up as wrong means; ``pixel_crc`` (CRC-32 of the de-woven
    index sequence) is ORDER-sensitive, so a mis-ordered interlace
    pass — invisible to permutation-invariant means — breaks it.
    Later frames are counted (``n_frames``) but not decoded — frame
    extraction at scale goes through :func:`demux_frames`."""
    import struct
    import zlib

    if len(content) < 13 or content[:6] not in GIF_SIGS:
        raise ValueError("not a GIF payload")
    sw, sh, packed, _bg, _aspect = struct.unpack("<HHBBB", content[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = content[pos:pos + 3 * n]
        pos += 3 * n
    n_frames = 0
    first = None
    while pos < len(content):
        b0 = content[pos]
        pos += 1
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension: label byte + sub-blocks
            pos += 1
            while pos < len(content) and content[pos]:
                pos += 1 + content[pos]
            pos += 1
        elif b0 == 0x2C:  # image descriptor
            if pos + 9 > len(content):
                raise ValueError("GIF image descriptor truncated")
            _l, _t, fw, fh, fp = struct.unpack(
                "<HHHHB", content[pos:pos + 9]
            )
            pos += 9
            pal = gct
            if fp & 0x80:
                n = 2 << (fp & 0x07)
                pal = content[pos:pos + 3 * n]
                pos += 3 * n
            min_code = content[pos]
            pos += 1
            data = bytearray()
            while pos < len(content) and content[pos]:
                sz = content[pos]
                data += content[pos + 1:pos + 1 + sz]
                pos += 1 + sz
            pos += 1  # block terminator
            n_frames += 1
            if first is None:
                if pal is None:
                    raise ValueError("GIF frame has no color table")
                if not 2 <= min_code <= 11:
                    raise ValueError(
                        f"bad GIF LZW min code size {min_code}"
                    )
                px = _gif_lzw(min_code, bytes(data), fw * fh)
                if len(px) < fw * fh:
                    raise ValueError("GIF pixel data truncated")
                first = (fw, fh, bool(fp & 0x40), pal, px[: fw * fh])
        else:
            raise ValueError(f"unknown GIF block 0x{b0:02x}")
    if first is None:
        raise ValueError("GIF has no image frame")
    fw, fh, interlaced, pal, px = first
    if interlaced:
        order = (
            list(range(0, fh, 8)) + list(range(4, fh, 8))
            + list(range(2, fh, 4)) + list(range(1, fh, 2))
        )
        woven = bytearray(fw * fh)
        for src, dst in enumerate(order):
            woven[dst * fw:(dst + 1) * fw] = px[src * fw:(src + 1) * fw]
        px = woven
    n_colors = len(pal) // 3
    tot_r = tot_g = tot_b = 0
    for i in px:
        if i >= n_colors:
            raise ValueError("GIF pixel index outside its color table")
        tot_r += pal[3 * i]
        tot_g += pal[3 * i + 1]
        tot_b += pal[3 * i + 2]
    n_px = max(fw * fh, 1)
    return {
        "format": "gif",
        "width": fw,
        "height": fh,
        "screen_width": sw,
        "screen_height": sh,
        "n_frames": n_frames,
        "pixel_crc": zlib.crc32(bytes(px)) & 0xFFFFFFFF,
        "mean_r": tot_r / n_px,
        "mean_g": tot_g / n_px,
        "mean_b": tot_b / n_px,
    }


def stdlib_decode_media(content: bytes, kind: str) -> dict:
    """Drop-in for :func:`decode_media` with REAL decoding where the
    standard library suffices: ``audio`` payloads parse as PCM WAV,
    ``image`` payloads as 24-bit BMP, 8-bit PNG or GIF (dispatched on
    the magic bytes — PNG and GIF are the compressed paths, DEFLATE-
    inflated + filter-reconstructed and LZW-decompressed
    respectively); every other kind falls back to the stub
    (the injected-codec seam is unchanged — this is one concrete
    decoder a deployment could inject, shipped in-tree). Returns the
    :data:`FEATURE_DDL` shape (magic_int + feature), with the decoded
    facts folded into the feature tag."""
    if kind == "audio":
        w = decode_wav(content)
        return {
            "magic_int": w["n_samples"],
            "feature": (
                f"wav:{w['sample_rate']}hz x{w['n_channels']} "
                f"{w['bits']}bit peak={w['peak']}"
            ),
        }
    if kind == "image":
        if content[:8] == PNG_SIG:
            p = decode_png(content)
            return {
                "magic_int": p["width"] * p["height"],
                "feature": (
                    f"png:{p['width']}x{p['height']} rgb=({p['mean_r']:.1f},"
                    f"{p['mean_g']:.1f},{p['mean_b']:.1f})"
                ),
            }
        if content[:6] in GIF_SIGS:
            g = decode_gif(content)
            return {
                "magic_int": g["width"] * g["height"],
                "feature": (
                    f"gif:{g['width']}x{g['height']} f{g['n_frames']} "
                    f"rgb=({g['mean_r']:.1f},{g['mean_g']:.1f},"
                    f"{g['mean_b']:.1f})"
                ),
            }
        b = decode_bmp(content)
        return {
            "magic_int": b["width"] * b["height"],
            "feature": (
                f"bmp:{b['width']}x{b['height']} rgb=({b['mean_r']:.1f},"
                f"{b['mean_g']:.1f},{b['mean_b']:.1f})"
            ),
        }
    return decode_media(content, kind)


def extract_features(
    df: DataFrame,
    decode: Callable[[bytes, str], dict] | None = None,
) -> DataFrame:
    """Arrow-batched feature extraction over media rows
    (mapInPandas): one Python crossing per batch, schema declared up
    front so the plan stays typed.

    The decoder is TRANSPORT-INJECTED, mirroring the connector seam in
    ``sources.ingest``: ``decode(content_bytes, kind) -> {"magic_int":
    int, "feature": str}``. The default is the container-limitation
    stub :func:`decode_media`; a production deployment passes a real
    PIL/ffmpeg/soundfile callable (serialized to executors with the
    closure) without touching any plan code."""
    decode = decode or decode_media
    # NOT ensure_parallelism'd (measured round 12, interleaved A/B):
    # repartitioning would shuffle the payload bytes — at bench scale
    # the probe+exchange overhead doubled q30, and at real scale
    # moving media bytes to gain parallelism is exactly the guide-§8
    # anti-pattern; a production media table's file layout already
    # spreads the scan

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decode(c, k) for c, k in zip(pdf["content"], pdf["kind"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["n_bytes"],
                    "content_md5": pdf["content_md5"],
                    "magic_int": [f["magic_int"] for f in feats],
                    "feature": [f["feature"] for f in feats],
                }
            )

    return df.mapInPandas(batches, FEATURE_DDL)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    resize: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Resize pipeline stage with an injected codec, same seam as
    :func:`extract_features`: ``resize(content, w, h) -> bytes``
    (decode + resize + re-encode in one call). Default is a
    pass-through fake (no codec libs in this container); the
    pass-through schema + target-size metadata plumbing is real either
    way, and byte-length/hash metadata are recomputed from the
    returned payload."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf.copy()
            if resize is not None:
                new_content = [resize(c, width, height) for c in pdf["content"]]
                out["content"] = new_content
                out["n_bytes"] = [len(c) for c in new_content]
                out["content_md5"] = [
                    hashlib.md5(c).hexdigest() for c in new_content
                ]
            out["target"] = f"{width}x{height}"
            yield out

    schema = MEDIA_META_DDL + ", target string"
    return df.mapInPandas(batches, schema)


def sample_frames(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Frame-offset sampling: fan each media row out to one row per
    sampled 'frame' offset (a real video path would demux the payload
    at these offsets).

    The fan-out is pure built-in algebra — ``explode(sequence(...))``
    — so it stays inside whole-stage codegen with ZERO Python in the
    plan; at 100 TB that matters on every media row. When a real
    demuxer needs the payload bytes per frame, use
    :func:`demux_frames`, which keeps this row multiplication
    vectorized inside the Arrow batch."""
    n = F.greatest(
        (F.col("n_bytes") / F.lit(every_n_bytes)).cast("long"), F.lit(1)
    )
    return df.select(
        "media_id",
        F.explode(F.sequence(F.lit(0).cast("long"), n - 1)).alias("__f"),
    ).select(
        "media_id",
        F.col("__f").cast("int").alias("frame_idx"),
        (F.col("__f") * every_n_bytes).cast("long").alias("offset"),
    )


def demux_frames(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """STUB demux path: same 1→N fan-out as :func:`sample_frames` but
    through mapInPandas, the shape a real frame decoder needs (the
    payload bytes are only reachable Python-side). Fully vectorized
    inside each Arrow batch — the ragged per-row aranges are built
    with ``np.repeat`` / cumulative offsets, no per-row Python loop."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = np.maximum(
                pdf["n_bytes"].to_numpy(dtype=np.int64) // every_n_bytes, 1
            )
            total = int(n.sum())
            starts = np.repeat(np.cumsum(n) - n, n)
            idx = np.arange(total, dtype=np.int64) - starts
            yield pd.DataFrame(
                {
                    "media_id": np.repeat(
                        pdf["media_id"].to_numpy(dtype=np.int64), n
                    ),
                    "frame_idx": idx.astype(np.int32),
                    "offset": idx * every_n_bytes,
                }
            )

    return df.mapInPandas(batches, "media_id bigint, frame_idx int, offset long")
