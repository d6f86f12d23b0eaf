"""Image output backends.

The reference writes PNG via Go stdlib and EXR/HDR/PFM via OpenImageIO
(internal/output/png.go, oiio.go); the ACES variant stamps ACES-container
metadata (oiio.go:26-41). Here: PNG via PIL; EXR/HDR/PFM as small pure-python
writers (no native imaging dependency exists in this environment).

Reference output semantics preserved:
- the PNG path applies gamma-2 + clamp(0,1) before quantization
  (leader.go:178-183 → postprocess Gamma+Clamp),
- EXR/HDR/PFM are written linear,
- the ACES EXR carries AP1 chromaticities + adopted-neutral metadata.
"""

from __future__ import annotations

import struct
import zlib
from typing import Optional

import numpy as np

from izpi_tpu.io import postprocess


def write(path: str, image: np.ndarray, mode: Optional[str] = None,
          aces: bool = False) -> None:
    """Dispatch by extension or explicit mode ∈ {png, exr, hdr, pfm}."""
    mode = mode or path.rsplit(".", 1)[-1].lower()
    if mode == "png":
        write_png(path, image)
    elif mode == "exr":
        write_exr(path, image, aces=aces)
    elif mode == "hdr":
        write_hdr(path, image)
    elif mode == "pfm":
        write_pfm(path, image)
    else:
        raise ValueError(f"unknown output mode {mode!r}")


def write_png(path: str, image: np.ndarray) -> None:
    """8-bit PNG with the reference's gamma-2 + clamp postfx
    (leader.go:178-183)."""
    from PIL import Image

    img = postprocess.Pipeline([postprocess.Gamma(), postprocess.Clamp()]) \
        .apply(np.asarray(image, np.float64))
    Image.fromarray((img * 255.0 + 0.5).astype(np.uint8)).save(path)


# ---------------------------------------------------------------------------
# OpenEXR (scanline, float32, zip-per-scanline) — minimal writer.
# ---------------------------------------------------------------------------


def _exr_attr(name: bytes, type_: bytes, data: bytes) -> bytes:
    return name + b"\0" + type_ + b"\0" + struct.pack("<i", len(data)) + data


def write_exr(path: str, image: np.ndarray, aces: bool = False) -> None:
    """Write a linear float32 EXR (ZIP-compressed scanlines, channels B,G,R).

    aces=True stamps ACEScg (AP1/D60) chromaticities + adoptedNeutral — the
    analog of the reference's OIIOACES writer metadata (output/oiio.go:26-41).
    """
    img = np.asarray(image, np.float32)
    h, w, _ = img.shape

    channels = b""
    for name in (b"B", b"G", b"R"):
        # pixel type 2 = FLOAT, pLinear 0, sampling 1,1
        channels += name + b"\0" + struct.pack("<iBBBBii", 2, 0, 0, 0, 0, 1, 1)
    channels += b"\0"

    header = b""
    header += _exr_attr(b"channels", b"chlist", channels)
    header += _exr_attr(b"compression", b"compression", struct.pack("B", 3))  # ZIP
    box = struct.pack("<iiii", 0, 0, w - 1, h - 1)
    header += _exr_attr(b"dataWindow", b"box2i", box)
    header += _exr_attr(b"displayWindow", b"box2i", box)
    header += _exr_attr(b"lineOrder", b"lineOrder", struct.pack("B", 0))
    header += _exr_attr(b"pixelAspectRatio", b"float", struct.pack("<f", 1.0))
    header += _exr_attr(b"screenWindowCenter", b"v2f",
                        struct.pack("<ff", 0.0, 0.0))
    header += _exr_attr(b"screenWindowWidth", b"float", struct.pack("<f", 1.0))
    if aces:
        # AP1 primaries + D60 white (ACEScg), plus adoptedNeutral.
        chroma = struct.pack("<8f", 0.713, 0.293, 0.165, 0.830,
                             0.128, 0.044, 0.32168, 0.33767)
        header += _exr_attr(b"chromaticities", b"chromaticities", chroma)
        header += _exr_attr(b"adoptedNeutral", b"v2f",
                            struct.pack("<ff", 0.32168, 0.33767))
    header += b"\0"

    # ZIP compression in EXR compresses 1 scanline block at a time with the
    # reorder+delta predictor.
    def exr_zip(raw: bytes) -> bytes:
        data = np.frombuffer(raw, np.uint8)
        half = (len(data) + 1) // 2
        interleaved = np.empty(len(data), np.uint8)
        interleaved[0::2] = data[:half]
        interleaved[1::2] = data[half:half + len(data) - half]
        delta = np.empty(len(data), np.uint8)
        delta[0] = interleaved[0]
        delta[1:] = (interleaved[1:].astype(np.int16)
                     - interleaved[:-1].astype(np.int16) + 128
                     ).astype(np.uint8)
        comp = zlib.compress(delta.tobytes())
        return comp if len(comp) < len(raw) else raw

    blocks = []
    for y in range(h):
        row = img[y]
        raw = (row[:, 2].tobytes() + row[:, 1].tobytes()
               + row[:, 0].tobytes())
        comp = exr_zip(raw)
        blocks.append(struct.pack("<ii", y, len(comp)) + comp)

    magic = struct.pack("<i", 20000630) + struct.pack("<i", 2)
    offset_table_size = 8 * h
    base = len(magic) + len(header) + offset_table_size
    offsets = []
    pos = base
    for blk in blocks:
        offsets.append(pos)
        pos += len(blk)

    with open(path, "wb") as f:
        f.write(magic)
        f.write(header)
        for off in offsets:
            f.write(struct.pack("<q", off))
        for blk in blocks:
            f.write(blk)


def write_pfm(path: str, image: np.ndarray) -> None:
    """Portable FloatMap (PF, little-endian, bottom-up rows)."""
    img = np.asarray(image, np.float32)
    h, w, _ = img.shape
    with open(path, "wb") as f:
        f.write(b"PF\n")
        f.write(f"{w} {h}\n".encode())
        f.write(b"-1.0\n")  # negative scale = little endian
        f.write(img[::-1].tobytes())


def write_hdr(path: str, image: np.ndarray) -> None:
    """Radiance RGBE (.hdr), uncompressed scanlines."""
    img = np.asarray(image, np.float64)
    h, w, _ = img.shape
    brightest = np.maximum(img.max(axis=-1), 1e-32)
    exponent = np.ceil(np.log2(brightest)).astype(np.int32) + 1
    scale = np.exp2(-exponent + 8)
    rgbe = np.zeros((h, w, 4), np.uint8)
    mantissa = np.clip(img * scale[..., None], 0, 255).astype(np.uint8)
    rgbe[..., :3] = mantissa
    rgbe[..., 3] = (exponent + 128).astype(np.uint8)
    zero = brightest < 1e-30
    rgbe[zero] = 0
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {h} +X {w}\n".encode())
        f.write(rgbe.tobytes())


# ---------------------------------------------------------------------------
# Readers (texture loading; the analog of the reference's OIIO reads).
# ---------------------------------------------------------------------------


def read_image(path: str) -> np.ndarray:
    """Read PNG/EXR/HDR/PFM to (H,W,3) float32. PNG is returned as raw
    [0,1] values with NO sRGB decode, matching texture/image.go:95-101."""
    ext = path.rsplit(".", 1)[-1].lower()
    if ext == "pfm":
        return _read_pfm(path)
    if ext == "hdr":
        import imageio.v2 as imageio

        return np.asarray(imageio.imread(path), np.float32)[..., :3]
    if ext == "exr":
        return _read_exr(path)
    from PIL import Image

    img = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
    return img


def _read_pfm(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        assert f.readline().strip() == b"PF"
        w, h = (int(x) for x in f.readline().split())
        scale = float(f.readline())
        data = np.frombuffer(f.read(), "<f4" if scale < 0 else ">f4")
    return data.reshape(h, w, 3)[::-1].astype(np.float32)


def _read_exr(path: str) -> np.ndarray:
    """Minimal reader for the EXRs this module writes (ZIP/None, FLOAT,
    B/G/R channels)."""
    with open(path, "rb") as f:
        data = f.read()
    assert struct.unpack("<i", data[:4])[0] == 20000630
    pos = 8
    attrs = {}
    while data[pos] != 0:
        end = data.index(b"\0", pos)
        name = data[pos:end].decode()
        pos = end + 1
        end = data.index(b"\0", pos)
        type_ = data[pos:end].decode()
        pos = end + 1
        size = struct.unpack("<i", data[pos:pos + 4])[0]
        pos += 4
        attrs[name] = (type_, data[pos:pos + size])
        pos += size
    pos += 1
    x0, y0, x1, y1 = struct.unpack("<iiii", attrs["dataWindow"][1])
    w, h = x1 - x0 + 1, y1 - y0 + 1
    comp = attrs["compression"][1][0]
    offsets = struct.unpack(f"<{h}q", data[pos:pos + 8 * h])
    out = np.zeros((h, w, 3), np.float32)
    for off in offsets:
        y, size = struct.unpack("<ii", data[off:off + 8])
        raw = data[off + 8: off + 8 + size]
        expect = w * 4 * 3
        if comp == 3 and size != expect:
            delta = np.frombuffer(zlib.decompress(raw), np.uint8).astype(np.int64)
            # Invert the delta predictor: rec[i] = rec[i-1] + delta[i] - 128.
            rec = np.cumsum(
                np.concatenate([delta[:1], delta[1:] - 128])
            ).astype(np.uint8)
            # Invert the two-way interleave.
            half = (len(rec) + 1) // 2
            deinter = np.empty(len(rec), np.uint8)
            deinter[:half] = rec[0::2]
            deinter[half:] = rec[1::2]
            raw = deinter.tobytes()
        row = np.frombuffer(raw, np.float32).reshape(3, w)
        out[y, :, 0] = row[2]
        out[y, :, 1] = row[1]
        out[y, :, 2] = row[0]
    return out
