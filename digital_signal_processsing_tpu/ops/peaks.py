"""Peak detection: a jittable on-device peak mask + scipy-style find_peaks.

Beyond-reference analysis surface (spectrum inspection, tone pickers for
the wideband scanner). The split mirrors the TPU constraint: peak INDEX
lists are dynamically shaped (not expressible under jit), so the device op
returns a same-shape boolean mask (compose with jnp.where/top_k), and the
scipy.signal.find_peaks-compatible index/property API runs host-side on
the fetched stream.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def peak_mask(x: jax.Array, *, height: float | None = None) -> jax.Array:
    """Boolean mask of strict local maxima over the last axis (endpoints
    never qualify). ``height``: optional minimum value. Plateaus do NOT
    count (no sample strictly exceeds both neighbors); use the host
    :func:`find_peaks` for scipy's plateau-midpoint semantics."""
    xf = x.astype(jnp.float32)
    left = jnp.pad(xf[..., :-1], [(0, 0)] * (xf.ndim - 1) + [(1, 0)],
                   constant_values=jnp.inf)
    right = jnp.pad(xf[..., 1:], [(0, 0)] * (xf.ndim - 1) + [(0, 1)],
                    constant_values=jnp.inf)
    m = (xf > left) & (xf > right)
    if height is not None:
        m = m & (xf >= height)
    return m


def _local_maxima_plateau(x: np.ndarray) -> np.ndarray:
    """Indices of local maxima, plateaus resolved to their midpoint
    (scipy.signal._peak_finding semantics)."""
    peaks = []
    i, n = 1, x.shape[0]
    while i < n - 1:
        if x[i - 1] < x[i]:
            ahead = i + 1
            while ahead < n - 1 and x[ahead] == x[i]:
                ahead += 1
            if x[ahead] < x[i]:
                peaks.append((i + ahead - 1) // 2)
                i = ahead
                continue
        i += 1
    return np.asarray(peaks, np.intp)


def peak_prominences(x, peaks):
    """(prominences, left_bases, right_bases) of each peak
    (scipy.signal.peak_prominences, host-side): height above the higher of
    the two lowest contour points reached before a taller sample in each
    direction; the bases are those contour minima's indices."""
    x = np.asarray(x, np.float64)
    peaks = np.asarray(peaks, np.intp)
    prom = np.empty(peaks.shape, np.float64)
    lbase = np.empty(peaks.shape, np.intp)
    rbase = np.empty(peaks.shape, np.intp)
    for k, p in enumerate(peaks):
        h = x[p]
        i = p - 1
        left_min, lb = h, p
        while i >= 0 and x[i] <= h:
            if x[i] < left_min:
                left_min, lb = x[i], i
            i -= 1
        j = p + 1
        right_min, rb = h, p
        while j < x.shape[0] and x[j] <= h:
            if x[j] < right_min:
                right_min, rb = x[j], j
            j += 1
        prom[k] = h - max(left_min, right_min)
        lbase[k], rbase[k] = lb, rb
    return prom, lbase, rbase


def find_peaks(
    x,
    *,
    height: float | None = None,
    threshold: float | None = None,
    distance: int | None = None,
    prominence: float | None = None,
):
    """scipy.signal.find_peaks-compatible peak indices + properties dict.

    Host-side numpy (dynamic output shapes can't live under jit — fetch
    the stream or a :func:`peak_mask` reduction first). Supported
    conditions: ``height`` (min value), ``threshold`` (min vertical
    distance to neighbors), ``distance`` (min index spacing, taller peaks
    kept first), ``prominence``. Evaluation order matches scipy.
    """
    x = np.asarray(x, np.float64)
    if x.ndim != 1:
        raise ValueError(f"find_peaks wants a 1-D stream, got shape {x.shape}")
    peaks = _local_maxima_plateau(x)
    props: dict[str, np.ndarray] = {}
    if height is not None:
        keep = x[peaks] >= height
        peaks = peaks[keep]
    if threshold is not None:
        lt = x[peaks] - x[peaks - 1]
        rt = x[peaks] - x[peaks + 1]
        keep = np.minimum(lt, rt) >= threshold
        peaks, lt, rt = peaks[keep], lt[keep], rt[keep]
        props["left_thresholds"], props["right_thresholds"] = lt, rt
    if distance is not None:
        if distance < 1:
            raise ValueError(f"distance must be >= 1, got {distance}")
        order = np.argsort(x[peaks])[::-1]  # tallest first, like scipy
        keep = np.ones(peaks.shape, bool)
        for o in order:
            if not keep[o]:
                continue
            p = peaks[o]
            kill = (np.abs(peaks - p) < distance) & keep
            kill[o] = False
            keep &= ~kill
        peaks = peaks[keep]
        for k in props:
            props[k] = props[k][keep]
    if prominence is not None:
        prom, lbase, rbase = peak_prominences(x, peaks)
        keep = prom >= prominence
        peaks = peaks[keep]
        props["prominences"] = prom[keep]
        props["left_bases"] = lbase[keep]
        props["right_bases"] = rbase[keep]
        for k in ("left_thresholds", "right_thresholds"):
            if k in props:
                props[k] = props[k][keep]
    if height is not None:
        props["peak_heights"] = x[peaks]
    return peaks, props


def peak_widths(x, peaks, *, rel_height: float = 0.5, prominence_data=None):
    """(widths, width_heights, left_ips, right_ips) of each peak at
    ``rel_height`` of its prominence (scipy.signal.peak_widths, host-side).

    The evaluation height is ``peak_height - rel_height * prominence``;
    crossings are linearly interpolated between samples, searched only
    within each peak's prominence bases like scipy.
    """
    if rel_height < 0:
        raise ValueError(f"rel_height must be >= 0, got {rel_height}")
    x = np.asarray(x, np.float64)
    peaks = np.asarray(peaks, np.intp)
    if prominence_data is None:
        prominence_data = peak_prominences(x, peaks)
    prom, lbase, rbase = prominence_data
    widths = np.empty(peaks.shape, np.float64)
    wh = np.empty(peaks.shape, np.float64)
    lips = np.empty(peaks.shape, np.float64)
    rips = np.empty(peaks.shape, np.float64)
    for k, p in enumerate(peaks):
        height = x[p] - rel_height * prom[k]
        wh[k] = height
        i = p
        while i > lbase[k] and x[i] > height:
            i -= 1
        lip = float(i)
        if x[i] < height:  # interpolate between i and i+1
            lip = i + (height - x[i]) / (x[i + 1] - x[i])
        j = p
        while j < rbase[k] and x[j] > height:
            j += 1
        rip = float(j)
        if x[j] < height:
            rip = j - (height - x[j]) / (x[j - 1] - x[j])
        lips[k], rips[k] = lip, rip
        widths[k] = rip - lip
    return widths, wh, lips, rips


def argrelextrema(x, comparator, *, order: int = 1):
    """Indices of relative extrema under ``comparator`` vs every neighbor
    within ``order`` samples on both sides (scipy.signal.argrelextrema,
    1-D, 'clip' boundary semantics)."""
    x = np.asarray(x)
    if x.ndim != 1:
        raise ValueError(f"argrelextrema wants 1-D, got shape {x.shape}")
    if order < 1:
        raise ValueError(f"order must be >= 1, got {order}")
    n = x.shape[0]
    keep = np.ones(n, bool)
    idx = np.arange(n)
    for shift in range(1, order + 1):
        keep &= comparator(x, x[np.minimum(idx + shift, n - 1)])
        keep &= comparator(x, x[np.maximum(idx - shift, 0)])
    return (np.nonzero(keep)[0],)


def argrelmax(x, *, order: int = 1):
    """Relative maxima (scipy.signal.argrelmax)."""
    return argrelextrema(x, np.greater, order=order)


def argrelmin(x, *, order: int = 1):
    """Relative minima (scipy.signal.argrelmin)."""
    return argrelextrema(x, np.less, order=order)
