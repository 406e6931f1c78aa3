"""Pure-Python media codecs for the multimodal pipeline: WAV-PCM audio
and PPM-P6 images — the two real formats decodable with zero external
codec libraries (stdlib ``wave``/``struct`` + numpy). They make the
multimodal decode path REAL for these formats; compressed formats
(JPEG/MP3/H.264) stay out of scope in this container (see
functions/multimodal.py docstring).

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
