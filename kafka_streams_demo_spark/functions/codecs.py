"""Pure-Python media codecs for the multimodal pipeline: WAV-PCM audio,
PPM-P6 images, and LZW-compressed GIF — all implementable from their
public specifications with zero external codec libraries (stdlib +
numpy). They make the multimodal decode path REAL for these formats,
including one genuinely COMPRESSED image format; entropy-coded formats
with large spec surfaces (JPEG/MP3/H.264) stay out of scope in this
container (see functions/multimodal.py docstring).

All codec functions are defined inside a factory and exported as
closures: cloudpickle pickles nested functions BY VALUE, so Spark
workers can run them inside mapInPandas without having this package on
their PYTHONPATH (the driver may run from anywhere — see the verify
harness). Imports live inside the function bodies for the same reason.
"""

from __future__ import annotations


def _make_codecs():
    def wav_encode(samples, rate: int = 8000) -> bytes:
        """Mono 16-bit PCM WAV from float samples in [-1, 1]."""
        import io
        import wave

        import numpy as np

        pcm = (np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
               * 32767).astype("<i2")
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(pcm.tobytes())
        return buf.getvalue()

    def wav_decode(payload: bytes) -> dict:
        """Real RIFF/WAVE parse + PCM stats: sample_rate, channels,
        n_samples, duration_s, rms, peak (floats in [-1, 1] domain)."""
        import io
        import math
        import wave

        import numpy as np

        with wave.open(io.BytesIO(bytes(payload))) as w:
            rate, nch = w.getframerate(), w.getnchannels()
            nfr, sw = w.getnframes(), w.getsampwidth()
            raw = w.readframes(nfr)
        if sw != 2:
            raise ValueError(f"only 16-bit PCM supported, got sampwidth={sw}")
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
        return {
            "sample_rate": rate,
            "channels": nch,
            "n_samples": nfr,
            "duration_s": nfr / rate if rate else 0.0,
            "rms": float(math.sqrt(float(np.mean(x * x)))) if x.size else 0.0,
            "peak": float(np.max(np.abs(x))) if x.size else 0.0,
        }

    def ppm_encode(pixels) -> bytes:
        """P6 PPM from an (h, w, 3) uint8 array."""
        import numpy as np

        px = np.asarray(pixels, dtype=np.uint8)
        h, w, _ = px.shape
        return b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()

    def ppm_decode(payload: bytes):
        """Parse P6 PPM (handles comment lines) → (h, w, 3) uint8 array."""
        import numpy as np

        data = bytes(payload)
        w, h, pos = _ppm_header(data, 0)
        raster = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=pos)
        return raster.reshape(h, w, 3).copy()

    def ppm_resize(payload: bytes, new_w: int, new_h: int) -> bytes:
        """Nearest-neighbor resize of a P6 payload, re-encoded as P6."""
        import numpy as np

        px = ppm_decode(payload)
        h, w, _ = px.shape
        rows = (np.arange(new_h) * h // new_h).clip(0, h - 1)
        cols = (np.arange(new_w) * w // new_w).clip(0, w - 1)
        return ppm_encode(px[rows][:, cols])

    def _ppm_header(data: bytes, base: int):
        """Parse one P6 header starting at ``base`` → (w, h, raster_start).

        Header per the netpbm spec: magic, then width/height/maxval as
        whitespace-separated tokens with '#' comments running to end of
        line, then ONE whitespace byte before the raster. maxval must be
        255 (1 byte/channel — larger maxvals switch to 2-byte samples and
        would shift every offset)."""
        if data[base:base + 2] != b"P6":
            raise ValueError(f"no P6 frame at offset {base}")
        pos, tokens = base + 2, []
        while len(tokens) < 3:
            while data[pos:pos + 1].isspace():
                pos += 1
            if data[pos:pos + 1] == b"#":
                pos = data.index(b"\n", pos) + 1
                continue
            start = pos
            while not data[pos:pos + 1].isspace():
                pos += 1
            tokens.append(int(data[start:pos]))
        w, h, maxval = tokens
        if maxval != 255:
            raise ValueError(f"only maxval=255 supported, got {maxval}")
        return w, h, pos + 1

    def ppm_video_frames(payload: bytes):
        """Frame index of a concatenated-P6 'video' (the uncompressed
        multi-frame container): [(frame_no, offset, length, w, h), ...]."""
        data = bytes(payload)
        out, base, fno = [], 0, 0
        while base < len(data):
            w, h, raster = _ppm_header(data, base)
            end = raster + w * h * 3
            out.append((fno, base, end - base, w, h))
            base, fno = end, fno + 1
        return out

    def ppm_video_encode(frames) -> bytes:
        """Concatenate (h, w, 3) uint8 arrays into the multi-frame payload."""
        return b"".join(ppm_encode(f) for f in frames)

    return (wav_encode, wav_decode, ppm_encode, ppm_decode, ppm_resize,
            ppm_video_encode, ppm_video_frames)


(wav_encode, wav_decode, ppm_encode, ppm_decode, ppm_resize,
 ppm_video_encode, ppm_video_frames) = _make_codecs()


def _make_gif_codec():
    """GIF87a/89a + LZW, from scratch per the public specification (the
    W3C GIF89a spec: logical screen descriptor, color tables, image
    descriptor, extension blocks, sub-block packed LZW image data with
    LSB-first variable-width codes). This is the REAL compressed-image
    tier of the multimodal pipeline — the decoder implements the full
    LZW grammar (dictionary growth, code-width increases, 12-bit cap
    with deferred clear, interlace reordering, local color tables);
    the encoder emits the literal-only LZW subset (a clear code before
    every pixel code keeps the code width fixed — valid per the spec,
    trades ratio for simplicity, exactly like the snappy writer).
    By-value closures for worker safety, same as the other codecs."""

    def _lzw_decode(data: bytes, min_code_size: int) -> list:
        clear, end = 1 << min_code_size, (1 << min_code_size) + 1
        pos = 0
        nbits = len(data) * 8

        def read(width: int):
            nonlocal pos
            if pos + width > nbits:
                return None
            v = 0
            for i in range(width):
                v |= ((data[(pos + i) >> 3] >> ((pos + i) & 7)) & 1) << i
            pos += width
            return v

        width = min_code_size + 1
        table: list = [(i,) for i in range(clear)] + [None, None]
        out: list = []
        prev = None
        while True:
            code = read(width)
            if code is None:
                break  # stream ended without END code: tolerate (common)
            if code == clear:
                table = table[: clear + 2]
                width = min_code_size + 1
                prev = None
                continue
            if code == end:
                break
            if code < len(table) and table[code] is not None:
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + (prev[0],)
            else:
                raise ValueError(f"corrupt LZW stream: code {code}")
            out.extend(entry)
            if prev is not None and len(table) < 4096:
                table.append(prev + (entry[0],))
            if len(table) == (1 << width) and width < 12:
                width += 1
            prev = entry
        return out

    def _lzw_encode_literal(indices, min_code_size: int) -> bytes:
        """Literal-only LZW: CLEAR before every pixel code pins the
        decoder's table at its initial size, so the width never grows."""
        clear, end = 1 << min_code_size, (1 << min_code_size) + 1
        width = min_code_size + 1
        bits = bytearray()
        acc, nacc = 0, 0

        def emit(code: int):
            nonlocal acc, nacc
            acc |= code << nacc
            nacc += width
            while nacc >= 8:
                bits.append(acc & 0xFF)
                acc >>= 8
                nacc -= 8

        for idx in indices:
            emit(clear)
            emit(int(idx))
        emit(end)
        if nacc:
            bits.append(acc & 0xFF)
        return bytes(bits)

    _INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))

    def _deinterlace(rows: list) -> list:
        h = len(rows)
        out = [None] * h
        src = 0
        for start, step in _INTERLACE_PASSES:
            for r in range(start, h, step):
                out[r] = rows[src]
                src += 1
        return out

    def gif_encode(pixels) -> bytes:
        """(h, w, 3) uint8 → single-frame GIF89a. Palette = the sorted
        distinct colors (≤ 256 required), padded to a power of two."""
        import numpy as np

        px = np.asarray(pixels, dtype=np.uint8)
        h, w, _ = px.shape
        flat = px.reshape(-1, 3)
        palette = np.unique(flat, axis=0)  # sorted lexicographically
        n = len(palette)
        if n > 256:
            raise ValueError(f"GIF supports <=256 colors, got {n}")
        size_bits = max(1, (max(n, 2) - 1).bit_length())  # table = 2^size_bits
        table_n = 1 << size_bits
        lut = {tuple(c): i for i, c in enumerate(palette.tolist())}
        indices = [lut[tuple(p)] for p in flat.tolist()]

        out = bytearray(b"GIF89a")
        out += int(w).to_bytes(2, "little") + int(h).to_bytes(2, "little")
        out.append(0x80 | 0x70 | (size_bits - 1))  # GCT flag, color res 8
        out += b"\x00\x00"  # bg index, aspect
        gct = bytearray()
        for i in range(table_n):
            gct += bytes(palette[i]) if i < n else b"\x00\x00\x00"
        out += gct
        out += b"\x2c" + b"\x00\x00\x00\x00"  # image descriptor at (0,0)
        out += int(w).to_bytes(2, "little") + int(h).to_bytes(2, "little")
        out.append(0x00)  # no local table, not interlaced
        min_code = max(2, size_bits)
        out.append(min_code)
        stream = _lzw_encode_literal(indices, min_code)
        for i in range(0, len(stream), 255):
            chunk = stream[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00\x3b"  # block terminator + trailer
        return bytes(out)

    def gif_frames(payload: bytes):
        """GIF → list of (h, w, 3) uint8 arrays, one per image block —
        multi-image GIFs (animations) are the engine's COMPRESSED video
        container. Frames must be full-canvas (left=top=0, frame size =
        screen size — true for everything this engine writes); partial-
        frame composition/disposal is out of scope and raises. Truncated
        or corrupt payloads raise ValueError (the codec-family contract),
        never a raw IndexError."""
        try:
            return _gif_frames_unchecked(payload)
        except IndexError as exc:
            raise ValueError("corrupt GIF: truncated input") from exc

    def _gif_frames_unchecked(payload: bytes):
        import numpy as np

        data = bytes(payload)
        if data[:6] not in (b"GIF87a", b"GIF89a"):
            raise ValueError("not a GIF (bad signature)")
        sw = int.from_bytes(data[6:8], "little")
        sh = int.from_bytes(data[8:10], "little")
        packed = data[10]
        pos = 13
        gct = None
        if packed & 0x80:
            n = 1 << ((packed & 0x07) + 1)
            gct = data[pos:pos + 3 * n]
            pos += 3 * n
        frames = []
        while pos < len(data):
            b = data[pos]
            pos += 1
            if b == 0x3B:  # trailer
                break
            if b == 0x21:  # extension: label + sub-blocks
                pos += 1
                while data[pos] != 0:
                    pos += 1 + data[pos]
                pos += 1
                continue
            if b != 0x2C:
                raise ValueError(f"unexpected GIF block 0x{b:02x}")
            left = int.from_bytes(data[pos:pos + 2], "little")
            top = int.from_bytes(data[pos + 2:pos + 4], "little")
            w = int.from_bytes(data[pos + 4:pos + 6], "little")
            h = int.from_bytes(data[pos + 6:pos + 8], "little")
            if (left, top) != (0, 0) or (w, h) != (sw, sh):
                raise ValueError("partial-canvas GIF frames unsupported")
            ipacked = data[pos + 8]
            pos += 9
            table = gct
            if ipacked & 0x80:  # local color table
                n = 1 << ((ipacked & 0x07) + 1)
                table = data[pos:pos + 3 * n]
                pos += 3 * n
            if table is None:
                raise ValueError("GIF image has no color table")
            min_code = data[pos]
            pos += 1
            stream = bytearray()
            while data[pos] != 0:
                ln = data[pos]
                stream += data[pos + 1:pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            indices = _lzw_decode(bytes(stream), min_code)
            if len(indices) < w * h:
                raise ValueError(
                    f"GIF raster short: {len(indices)} of {w * h} pixels"
                )
            pal = np.frombuffer(table, dtype=np.uint8).reshape(-1, 3)
            idx = np.asarray(indices[: w * h], dtype=np.int64)
            if idx.max(initial=0) >= len(pal):
                raise ValueError("GIF pixel index outside color table")
            raster = pal[idx].reshape(h, w, 3)
            if ipacked & 0x40:  # interlaced: restore row order
                rows = [raster[r] for r in range(h)]
                raster = np.stack(_deinterlace(rows))
            frames.append(raster.copy())
        if not frames:
            raise ValueError("GIF contains no image data")
        return frames

    def gif_decode(payload: bytes):
        """GIF → (h, w, 3) uint8 array of the FIRST image."""
        return gif_frames(payload)[0]

    def gif_encode_animation(frames) -> bytes:
        """Full-canvas frames → one multi-image GIF89a sharing a global
        palette (union of all frames' colors, ≤ 256)."""
        import numpy as np

        fs = [np.asarray(f, dtype=np.uint8) for f in frames]
        if not fs:
            raise ValueError("no frames")
        h, w, _ = fs[0].shape
        if any(f.shape != (h, w, 3) for f in fs):
            raise ValueError("all frames must share the canvas size")
        allpx = np.concatenate([f.reshape(-1, 3) for f in fs])
        palette = np.unique(allpx, axis=0)
        n = len(palette)
        if n > 256:
            raise ValueError(f"GIF supports <=256 colors, got {n}")
        size_bits = max(1, (max(n, 2) - 1).bit_length())
        table_n = 1 << size_bits
        lut = {tuple(c): i for i, c in enumerate(palette.tolist())}

        out = bytearray(b"GIF89a")
        out += int(w).to_bytes(2, "little") + int(h).to_bytes(2, "little")
        out.append(0x80 | 0x70 | (size_bits - 1))
        out += b"\x00\x00"
        for i in range(table_n):
            out += bytes(palette[i]) if i < n else b"\x00\x00\x00"
        min_code = max(2, size_bits)
        for f in fs:
            out += b"\x2c" + b"\x00\x00\x00\x00"
            out += int(w).to_bytes(2, "little") + int(h).to_bytes(2, "little")
            out.append(0x00)
            out.append(min_code)
            indices = [lut[tuple(p)] for p in f.reshape(-1, 3).tolist()]
            stream = _lzw_encode_literal(indices, min_code)
            for i in range(0, len(stream), 255):
                chunk = stream[i:i + 255]
                out.append(len(chunk))
                out += chunk
            out += b"\x00"
        out += b"\x3b"
        return bytes(out)

    def gif_resize(payload: bytes, new_w: int, new_h: int) -> bytes:
        """Nearest-neighbor resize of a (single-frame) GIF, re-encoded —
        the compressed-image sibling of ``ppm_resize``."""
        import numpy as np

        px = gif_decode(payload)
        h, w, _ = px.shape
        rows = (np.arange(new_h) * h) // new_h
        cols = (np.arange(new_w) * w) // new_w
        return gif_encode(px[rows][:, cols])

    def gif_meta(payload: bytes) -> dict:
        """Decode + summarize: width, height, n_colors actually used."""
        import numpy as np

        px = gif_decode(payload)
        h, w, _ = px.shape
        n_colors = int(len(np.unique(px.reshape(-1, 3), axis=0)))
        return {"width": int(w), "height": int(h), "n_colors": n_colors}

    return (gif_encode, gif_decode, gif_meta, gif_frames,
            gif_encode_animation, gif_resize, _lzw_decode,
            _lzw_encode_literal)


(gif_encode, gif_decode, gif_meta, gif_frames, gif_encode_animation,
 gif_resize, _gif_lzw_decode, _gif_lzw_encode_literal) = _make_gif_codec()
