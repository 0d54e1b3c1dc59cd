"""REAL codec-free media decode kernels (r15).

The sandbox has no image/audio codecs (PIL/av/cv2/ffmpeg absent — probed
every round, see operators/multimodal.py), but UNCOMPRESSED formats need
none: binary PPM (P6) is a whitespace header plus raw RGB bytes, and
RIFF/WAVE PCM16 is a chunk list plus raw samples — so a pure
NumPy/stdlib parse IS the full decoder, not a stub. These kernels run in
the same mapInPandas plumbing as multimodal.py's codec-bound stubs and
turn the standing multimodal `weak` into tested decode paths with
closed-form fixtures (synth_ppm / synth_wav) that a SQL oracle can
recompute exactly (query_defs/media_q.py).

This lives in its own module (not multimodal.py) deliberately: the
ledger's closure digests (carbondata_spark/ledger.py) track result
machinery per module, and multimodal.py sits inside the closure of
every pipeline.py driver row — landing NEW kernels there would dirty 40
unrelated rows' digests for a change that cannot affect their results.

Binary payload model (same as multimodal.py):

    media: struct fields (doc_id, media_type, content: binary,
           meta: struct<codec string, n_bytes long>)
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "doc_id long, media_type string, content binary, "
    "meta struct<codec string, n_bytes long>"
)

PPM_DECODED_SCHEMA = (
    "doc_id long, width int, height int, maxval int, pixel_sum long"
)

WAV_DECODED_SCHEMA = (
    "doc_id long, n_channels int, sample_rate int, bits int, "
    "n_samples long, amp_sum long"
)


# Parser FACTORIES: each returns a self-contained parse closure (stdlib +
# numpy only, imports bound inside the factory). Kernels call a factory
# on the DRIVER and close over the returned function, so cloudpickle
# serializes the parser BY VALUE — executor python workers never need
# carbondata_spark on their sys.path (the driver may run from outside the
# repo), only numpy. This also lets decode_media_dispatch reuse the exact
# single-format parsers instead of duplicating them.


def _make_ppm_parser():
    import numpy as np

    def parse(buf: bytes) -> tuple[int, int, int, int]:
        if buf[:2] != b"P6":
            raise ValueError("not a binary PPM (P6) payload")
        fields: list[int] = []
        pos = 2
        while len(fields) < 3:
            while pos < len(buf) and buf[pos : pos + 1].isspace():
                pos += 1
            if buf[pos : pos + 1] == b"#":
                while pos < len(buf) and buf[pos] != 0x0A:
                    pos += 1
                continue
            start = pos
            while pos < len(buf) and not buf[pos : pos + 1].isspace():
                pos += 1
            if start == pos:
                raise ValueError("truncated PPM header")
            fields.append(int(buf[start:pos]))
        pos += 1  # exactly one whitespace byte after maxval
        w, h, maxval = fields
        if not (0 < maxval < 256):
            raise ValueError(f"unsupported PPM maxval {maxval}")
        n = 3 * w * h
        px = np.frombuffer(buf, dtype=np.uint8, offset=pos)
        if px.size < n:
            raise ValueError(
                f"truncated PPM payload: {px.size} of {n} pixel bytes"
            )
        px = px[:n]
        return w, h, maxval, int(px.sum(dtype=np.int64))

    return parse


def _make_wav_parser():
    import struct

    import numpy as np

    def parse(buf: bytes) -> tuple[int, int, int, int, int]:
        if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
            raise ValueError("not a RIFF/WAVE payload")
        pos, fmt, data = 12, None, None
        while pos + 8 <= len(buf):
            cid = buf[pos : pos + 4]
            (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            body = buf[pos + 8 : pos + 8 + size]
            if cid == b"fmt ":
                fmt = struct.unpack("<HHIIHH", body[:16])
            elif cid == b"data":
                data = body
            pos += 8 + size + (size & 1)  # odd chunks carry a pad byte
        if fmt is None or data is None:
            raise ValueError("WAVE missing fmt/data chunk")
        audio_format, ch, rate, _brate, _align, bits = fmt
        if audio_format != 1 or bits != 16:
            raise ValueError(
                f"only PCM16 supported (format={audio_format}, bits={bits})"
            )
        samples = np.frombuffer(data, dtype="<i2")
        return ch, rate, bits, samples.size, int(samples.sum(dtype=np.int64))

    return parse


def _make_bmp_parser():
    import struct

    import numpy as np

    def parse(buf: bytes) -> tuple[int, int, int, int, int]:
        if buf[:2] != b"BM":
            raise ValueError("not a BMP payload")
        if len(buf) < 54:
            raise ValueError("truncated BMP header")
        (offset,) = struct.unpack("<I", buf[10:14])
        hdr_size, w, h_raw, planes, bits, compression = struct.unpack(
            "<IiiHHI", buf[14:34]
        )
        if hdr_size < 40:
            raise ValueError(f"unsupported BMP header size {hdr_size}")
        if planes != 1 or bits != 24 or compression != 0:
            raise ValueError(
                f"only uncompressed 24-bit BMP supported "
                f"(planes={planes}, bits={bits}, compression={compression})"
            )
        top_down = h_raw < 0
        h = -h_raw if top_down else h_raw
        if w <= 0 or h <= 0:
            raise ValueError(f"bad BMP dimensions {w}x{h_raw}")
        stride = (3 * w + 3) & ~3
        if len(buf) < offset + stride * h:
            raise ValueError(
                f"truncated BMP pixel array: {len(buf) - offset} of "
                f"{stride * h} bytes"
            )
        arr = np.frombuffer(
            buf, dtype=np.uint8, count=stride * h, offset=offset
        ).reshape(h, stride)[:, : 3 * w]
        if not top_down:
            arr = arr[::-1]  # restore image (top-first) row order
        return (
            w,
            h,
            bits,
            int(arr.sum(dtype=np.int64)),
            int(arr[0].sum(dtype=np.int64)),
        )

    return parse


def synth_ppm(docs: DataFrame) -> DataFrame:
    """Deterministic binary-PPM (P6) fixture encoder: one real image per
    doc_id in the media column model. width = 4 + doc_id % 5, height =
    2 + doc_id % 3, maxval 255, pixel byte i = (doc_id*7 + i) % 256 in
    row-major RGB order — closed forms a SQL oracle can recompute. The
    header carries a comment line so the decoder's comment handling is
    exercised on every image."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def enc(doc_id: int) -> bytes:
            w, h = 4 + doc_id % 5, 2 + doc_id % 3
            header = b"P6\n# synth fixture\n%d %d\n255\n" % (w, h)
            return header + bytes(
                (doc_id * 7 + i) % 256 for i in range(3 * w * h)
            )

        for pdf in it:
            content = [enc(int(d)) for d in pdf["doc_id"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "media_type": "image",
                    "content": content,
                    "meta": [
                        {"codec": "image/x-portable-pixmap", "n_bytes": len(c)}
                        for c in content
                    ],
                }
            )

    return docs.select("doc_id").mapInPandas(batches, schema=MEDIA_SCHEMA)


def decode_ppm(media: DataFrame) -> DataFrame:
    """REAL image decode kernel — no external codec: binary PPM (P6) is
    an uncompressed format (magic, whitespace-separated width/height/
    maxval with ``#`` comments, then raw RGB bytes), so a header parse +
    ``np.frombuffer`` IS the full decoder. Emits per-image dimensions
    and pixel statistics; malformed or truncated payloads raise (bad
    media must fail loudly, not decode to garbage)."""

    parse = _make_ppm_parser()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            parsed = [parse(bytes(c)) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "width": [p[0] for p in parsed],
                    "height": [p[1] for p in parsed],
                    "maxval": [p[2] for p in parsed],
                    "pixel_sum": [p[3] for p in parsed],
                }
            )

    return media.mapInPandas(batches, schema=PPM_DECODED_SCHEMA)


def synth_wav(docs: DataFrame) -> DataFrame:
    """Deterministic RIFF/WAVE PCM16 fixture encoder: n_channels =
    1 + doc_id % 2, sample_rate = 8000 + 1000*(doc_id % 3), frames =
    16 + doc_id % 7; interleaved sample j = ((doc_id*13 + j) % 4001) -
    2000. A junk ``LIST`` chunk precedes ``data`` so the decoder's
    chunk walk (not a fixed offset) is exercised on every payload."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        def enc(doc_id: int) -> bytes:
            ch = 1 + doc_id % 2
            rate = 8000 + 1000 * (doc_id % 3)
            n = (16 + doc_id % 7) * ch
            data = b"".join(
                struct.pack("<h", ((doc_id * 13 + j) % 4001) - 2000)
                for j in range(n)
            )
            fmt = struct.pack(
                "<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16
            )
            junk = b"fake"  # exercises the chunk walk
            body = (
                b"WAVE"
                + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"LIST" + struct.pack("<I", len(junk)) + junk
                + b"data" + struct.pack("<I", len(data)) + data
            )
            return b"RIFF" + struct.pack("<I", len(body)) + body

        for pdf in it:
            content = [enc(int(d)) for d in pdf["doc_id"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "media_type": "audio",
                    "content": content,
                    "meta": [
                        {"codec": "audio/wav", "n_bytes": len(c)}
                        for c in content
                    ],
                }
            )

    return docs.select("doc_id").mapInPandas(batches, schema=MEDIA_SCHEMA)


def decode_wav(media: DataFrame) -> DataFrame:
    """REAL audio decode kernel — no external codec: RIFF/WAVE with PCM16
    is header + raw samples. Walks the chunk list (skipping unknown
    chunks, honoring the odd-size pad byte) to ``fmt `` and ``data``,
    then ``np.frombuffer('<i2')`` for the sample statistics."""

    parse = _make_wav_parser()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            parsed = [parse(bytes(c)) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "n_channels": [p[0] for p in parsed],
                    "sample_rate": [p[1] for p in parsed],
                    "bits": [p[2] for p in parsed],
                    "n_samples": [p[3] for p in parsed],
                    "amp_sum": [p[4] for p in parsed],
                }
            )

    return media.mapInPandas(batches, schema=WAV_DECODED_SCHEMA)


BMP_DECODED_SCHEMA = (
    "doc_id long, width int, height int, bits int, "
    "pixel_sum long, top_row_sum long"
)


def synth_bmp(docs: DataFrame) -> DataFrame:
    """Deterministic 24-bit uncompressed BMP (BITMAPINFOHEADER / BI_RGB)
    fixture encoder: width = 3 + doc_id % 5, height = 2 + doc_id % 3,
    pixel byte i (BGR, IMAGE row-major from the top-left) =
    (doc_id*11 + i) % 256 — stored bottom-up with rows padded to 4-byte
    boundaries, as the format requires. A 2-byte gap is left between the
    headers and the pixel array so the decoder must honor the pixel-data
    OFFSET field rather than assume 54."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        def enc(doc_id: int) -> bytes:
            w, h = 3 + doc_id % 5, 2 + doc_id % 3
            stride = (3 * w + 3) & ~3
            gap = b"\x00\x00"  # exercises the offset field
            offset = 14 + 40 + len(gap)
            size = offset + stride * h
            file_hdr = b"BM" + struct.pack("<IHHI", size, 0, 0, offset)
            info_hdr = struct.pack(
                "<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 2835, 2835, 0, 0
            )
            rows = []
            for y in range(h - 1, -1, -1):  # bottom-up storage order
                base = 3 * w * y
                row = bytes((doc_id * 11 + base + x) % 256 for x in range(3 * w))
                rows.append(row + b"\x00" * (stride - 3 * w))
            return file_hdr + info_hdr + gap + b"".join(rows)

        for pdf in it:
            content = [enc(int(d)) for d in pdf["doc_id"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "media_type": "image",
                    "content": content,
                    "meta": [
                        {"codec": "image/bmp", "n_bytes": len(c)}
                        for c in content
                    ],
                }
            )

    return docs.select("doc_id").mapInPandas(batches, schema=MEDIA_SCHEMA)


def decode_bmp(media: DataFrame) -> DataFrame:
    """REAL image decode kernel — no external codec: 24-bit BI_RGB BMP is
    two fixed headers plus raw padded BGR rows stored bottom-up. Parses
    the file header (honoring the pixel-array offset field) and
    BITMAPINFOHEADER, rejects anything but uncompressed 24-bit single-
    plane payloads, and reads the pixel array row-by-row with the 4-byte
    stride — the ``top_row_sum`` statistic (first IMAGE row = LAST stored
    row) fails if stride or bottom-up order is mishandled, which a plain
    whole-buffer sum would mask. Negative height (top-down storage) is
    honored; malformed or truncated payloads raise."""

    parse = _make_bmp_parser()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            parsed = [parse(bytes(c)) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "width": [p[0] for p in parsed],
                    "height": [p[1] for p in parsed],
                    "bits": [p[2] for p in parsed],
                    "pixel_sum": [p[3] for p in parsed],
                    "top_row_sum": [p[4] for p in parsed],
                }
            )

    return media.mapInPandas(batches, schema=BMP_DECODED_SCHEMA)


MEDIA_DISPATCH_SCHEMA = (
    "doc_id long, codec string, width int, height int, n_channels int, "
    "sample_rate int, unit_count long, value_sum long"
)


def synth_media_mixed(docs: DataFrame) -> DataFrame:
    """Heterogeneous media fixture: one payload per doc_id, format routed
    by doc_id % 3 (0 → binary PPM, 1 → RIFF/WAVE PCM16, 2 → 24-bit BMP),
    reusing the three single-format synthesizers unchanged — the real
    multimodal table shape, where one binary column carries several
    codecs and ``meta.codec`` types each row."""
    from pyspark.sql import functions as F

    m = F.col("doc_id") % 3
    return (
        synth_ppm(docs.filter(m == 0))
        .unionByName(synth_wav(docs.filter(m == 1)))
        .unionByName(synth_bmp(docs.filter(m == 2)))
    )


def decode_media_dispatch(media: DataFrame) -> DataFrame:
    """Typed decode over a MIXED media column: ONE Arrow-batched
    mapInPandas kernel dispatches each payload on its magic bytes
    (``P6`` / ``RIFF`` / ``BM``) to the matching single-format parser —
    the exact functions decode_ppm/decode_wav/decode_bmp use, via the
    parser factories — and emits one unified row shape (image rows carry
    NULL audio fields and vice versa; ``unit_count`` is pixel-bytes for
    images, samples for audio). An unrecognized payload raises: silent
    skips would turn a corrupt corpus into a short result. Per-row
    dispatch on a format tag is how a 100 TB multimodal scan actually
    runs — partition-parallel, no shuffle, one pass whatever the codec
    mix — instead of N filtered single-format passes over the same
    bytes."""
    ppm, wav, bmp = _make_ppm_parser(), _make_wav_parser(), _make_bmp_parser()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(buf: bytes) -> tuple:
            if buf[:2] == b"P6":
                w, h, _maxval, psum = ppm(buf)
                return ("ppm", w, h, 3, None, 3 * w * h, psum)
            if buf[:4] == b"RIFF":
                ch, rate, _bits, n, asum = wav(buf)
                return ("wav", None, None, ch, rate, n, asum)
            if buf[:2] == b"BM":
                w, h, _bits, psum, _top = bmp(buf)
                return ("bmp", w, h, 3, None, 3 * w * h, psum)
            raise ValueError(
                f"unrecognized media payload (magic {buf[:4]!r})"
            )

        cols = (
            "codec", "width", "height", "n_channels",
            "sample_rate", "unit_count", "value_sum",
        )
        for pdf in it:
            parsed = [one(bytes(c)) for c in pdf["content"]]
            out = {"doc_id": pdf["doc_id"].values}
            out.update(
                {c: [p[i] for p in parsed] for i, c in enumerate(cols)}
            )
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=MEDIA_DISPATCH_SCHEMA)
