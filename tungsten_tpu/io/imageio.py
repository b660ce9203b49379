"""Image IO: LDR (png/jpg/tga/bmp) via PIL, HDR (.hdr/.exr) via OpenCV, PFM native.

Mirrors src/core/io/ImageIO.cpp capabilities. Loaded images are numpy float32
RGB in scanline order (row 0 = top), linearized: LDR sources get the sRGB/2.2
gamma removed when requested (BitmapTexture applies gamma on load).
"""
from __future__ import annotations

import os

import numpy as np

os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")

HDR_EXTS = {".hdr", ".exr", ".pfm"}


def is_hdr(path: str) -> bool:
    return os.path.splitext(path)[1].lower() in HDR_EXTS


def load_pfm(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        header = f.readline().strip()
        channels = 3 if header == b"PF" else 1
        dims = f.readline().split()
        w, h = int(dims[0]), int(dims[1])
        scale = float(f.readline().strip())
        data = np.frombuffer(f.read(), "<f4" if scale < 0 else ">f4")
        img = data.reshape(h, w, channels)[::-1]  # PFM is bottom-up
    return np.ascontiguousarray(img, np.float32)


def save_pfm(path: str, img: np.ndarray) -> None:
    img = np.asarray(img, np.float32)
    h, w = img.shape[:2]
    with open(path, "wb") as f:
        f.write(b"PF\n" if img.ndim == 3 else b"Pf\n")
        f.write(f"{w} {h}\n".encode())
        f.write(b"-1.0\n")
        f.write(np.ascontiguousarray(img[::-1]).astype("<f4").tobytes())


def load_image(path: str, gamma_correct: bool = True) -> np.ndarray:
    """Load any supported image as float32 RGB (H, W, 3), linear radiometry."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".pfm":
        img = load_pfm(path)
        if img.shape[-1] == 1:
            img = np.repeat(img, 3, axis=-1)
        return img
    if ext in (".hdr", ".exr"):
        import cv2

        img = cv2.imread(path, cv2.IMREAD_ANYDEPTH | cv2.IMREAD_ANYCOLOR)
        if img is None:
            raise IOError(f"failed to load image: {path}")
        if img.ndim == 2:
            img = np.repeat(img[..., None], 3, axis=-1)
        else:
            img = img[..., ::-1]  # BGR -> RGB
        return np.ascontiguousarray(img, np.float32)
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGB")
        img = np.asarray(im, np.float32) / 255.0
    if gamma_correct:
        # BitmapTexture linearizes LDR input with gamma 2.2
        img = img**2.2
    return img


def save_image(path: str, img: np.ndarray) -> None:
    """Save float32 RGB. LDR formats expect tonemapped [0,1] values and use
    the reference's quantization (floor to int, Integrator.cpp:writeBuffers)."""
    ext = os.path.splitext(path)[1].lower()
    img = np.asarray(img, np.float32)
    if ext == ".pfm":
        save_pfm(path, img)
    elif ext in (".hdr", ".exr"):
        import cv2

        ok = cv2.imwrite(path, np.ascontiguousarray(img[..., ::-1]))
        if not ok:
            raise IOError(f"failed to save image: {path}")
    else:
        from PIL import Image

        u8 = np.clip((img * 255.0).astype(np.int32), 0, 255).astype(np.uint8)
        Image.fromarray(u8, "RGB").save(path)
