"""General IIR design: analog prototypes -> zpk transforms -> SOS cascades.

Completes the classical design surface around ops/iir.py's bespoke
Butterworth/Chebyshev functions: one zpk pipeline gives every family
(Butterworth, Chebyshev I/II, elliptic/Cauer) every band type
(lowpass/highpass/bandpass/bandstop), mirroring scipy.signal.iirfilter's
architecture without depending on scipy at runtime. All host-side float64
numpy — filters run on TPU through ops/iir.sosfilt; design is a trace-time
constant like the reference's host-side coefficient computation
(profilable_sm_averager.cu:65's precomputed inverseGrade, one level up).

The elliptic prototype uses descending Landen/Gauss transformations for the
Jacobi elliptic functions (cd, sn, and the inverse sn) and the exact
degree-equation solution for the modulus — the standard Orfanidis recipe —
implemented from scratch in numpy; parity vs scipy.signal.ellip is pinned
in tests/test_design_spectral.py.
"""

from __future__ import annotations

import numpy as np

__all__ = ["iirfilter", "design_elliptic", "zpk2sos", "butter_zpk_proto"]


# --- Jacobi elliptic functions via Landen transformations --------------------


def _landen(k: float, tol: float = 1e-18) -> np.ndarray:
    """Descending Landen sequence k_1, k_2, ... until k_n < tol."""
    ks = []
    k = float(k)
    if not 0.0 <= k < 1.0:
        raise ValueError(f"elliptic modulus must be in [0, 1), got {k}")
    while k > tol:
        k = (k / (1.0 + np.sqrt(1.0 - k * k))) ** 2
        ks.append(k)
        if len(ks) > 64:  # quadratic convergence: never reached for k < 1
            break
    return np.asarray(ks)


def _cde(u, k: float):
    """cd(u*K(k), k) for normalized (possibly complex) u."""
    ks = _landen(k)
    w = np.cos(np.asarray(u, dtype=complex) * (np.pi / 2.0))
    for ki in ks[::-1]:
        w = (1.0 + ki) * w / (1.0 + ki * w * w)
    return w


def _sne(u, k: float):
    """sn(u*K(k), k) for normalized (possibly complex) u."""
    ks = _landen(k)
    w = np.sin(np.asarray(u, dtype=complex) * (np.pi / 2.0))
    for ki in ks[::-1]:
        w = (1.0 + ki) * w / (1.0 + ki * w * w)
    return w


def _asne(w, k: float):
    """Inverse of :func:`_sne` (principal branch), complex-safe."""
    ks = _landen(k)
    w = np.asarray(w, dtype=complex)
    kprev = k
    for ki in ks:
        w = 2.0 * w / ((1.0 + ki) * (1.0 + np.sqrt(1.0 - kprev * kprev * w * w)))
        kprev = ki
    return 2.0 / np.pi * np.arcsin(w)


def _ellipdeg(n: int, k1: float) -> float:
    """Solve the elliptic degree equation for the selectivity modulus k.

    Exact solution k = sqrt(1 - (k1'^n * prod sn((2i-1)/n, k1')^4)^2)
    given the degree n and the discrimination modulus k1 = eps_p/eps_s.
    """
    kc = np.sqrt(1.0 - k1 * k1)  # complement of k1
    L = n // 2
    ui = (2.0 * np.arange(1, L + 1) - 1.0) / n
    kp = kc**n * np.prod(np.real(_sne(ui, kc))) ** 4
    return float(np.sqrt(1.0 - kp * kp))


# --- analog lowpass prototypes (cutoff 1 rad/s) -------------------------------


def butter_zpk_proto(order: int):
    """Butterworth analog prototype: poles on the unit circle, no zeros."""
    k = np.arange(order)
    p = np.exp(1j * np.pi * (2 * k + order + 1) / (2 * order))
    return np.array([], complex), p, 1.0 / np.real(np.prod(-p))


def _cheby1_zpk_proto(order: int, rp_db: float):
    eps = np.sqrt(10.0 ** (rp_db / 10.0) - 1.0)
    mu = np.arcsinh(1.0 / eps) / order
    k = np.arange(order)
    theta = np.pi * (2 * k + 1) / (2 * order)
    p = -np.sinh(mu) * np.sin(theta) + 1j * np.cosh(mu) * np.cos(theta)
    gain = np.real(np.prod(-p))
    if order % 2 == 0:  # passband peaks at 1; DC sits at -rp
        gain /= np.sqrt(1.0 + eps * eps)
    return np.array([], complex), p, float(gain)


def _cheby2_zpk_proto(order: int, rs_db: float):
    eps = 1.0 / np.sqrt(10.0 ** (rs_db / 10.0) - 1.0)
    mu = np.arcsinh(1.0 / eps) / order
    k = np.arange(order)
    theta = np.pi * (2 * k + 1) / (2 * order)
    p1 = -np.sinh(mu) * np.sin(theta) + 1j * np.cosh(mu) * np.cos(theta)
    p = 1.0 / p1
    with np.errstate(divide="ignore"):
        zc = np.cos(theta)
    z = 1j / zc[np.abs(zc) > 1e-12]  # odd order: middle zero at infinity
    gain = np.real(np.prod(-p)) / np.real(np.prod(-z))
    return z, p, float(gain)


def _ellip_zpk_proto(order: int, rp_db: float, rs_db: float):
    """Elliptic (Cauer) analog prototype (Orfanidis Landen recipe)."""
    if order == 1:  # degenerate: same as Chebyshev I first order
        eps = np.sqrt(10.0 ** (rp_db / 10.0) - 1.0)
        p = np.array([-1.0 / eps], complex)
        return np.array([], complex), p, 1.0 / eps
    ep = np.sqrt(10.0 ** (rp_db / 10.0) - 1.0)
    es = np.sqrt(10.0 ** (rs_db / 10.0) - 1.0)
    k1 = ep / es
    k = _ellipdeg(order, k1)
    L, r = order // 2, order % 2
    ui = (2.0 * np.arange(1, L + 1) - 1.0) / order
    zeta = np.real(_cde(ui, k))  # in (0, 1)
    z_half = 1j / (k * zeta)
    v0 = np.real(-1j * _asne(1j / ep, k1) / order)
    p_half = 1j * _cde(ui - 1j * v0, k)
    z = np.concatenate([z_half, np.conj(z_half)])
    p = np.concatenate([p_half, np.conj(p_half)])
    if r:
        p0 = 1j * _sne(1j * v0, k)
        p = np.concatenate([p, [complex(np.real(p0), 0.0)]])
    gain = np.real(np.prod(-p)) / np.real(np.prod(-z))
    if r == 0:  # even order: DC gain 1/sqrt(1+eps^2)
        gain /= np.sqrt(1.0 + ep * ep)
    return z, p, float(gain)


# --- zpk band transforms (scipy lp2*_zpk semantics) ----------------------------


def _lp2lp_zpk(z, p, k, wo):
    deg = len(p) - len(z)
    return z * wo, p * wo, k * wo**deg


def _lp2hp_zpk(z, p, k, wo):
    deg = len(p) - len(z)
    zh = wo / z if len(z) else np.array([], complex)
    ph = wo / p
    zh = np.append(zh, np.zeros(deg))
    k = k * np.real(np.prod(-z) / np.prod(-p)) if len(z) else k / np.real(
        np.prod(-p)
    )
    return zh, ph, k


def _lp2bp_zpk(z, p, k, wo, bw):
    deg = len(p) - len(z)
    zs = z * bw / 2.0
    ps = p * bw / 2.0
    zb = np.concatenate(
        [zs + np.sqrt(zs * zs - wo * wo), zs - np.sqrt(zs * zs - wo * wo)]
    ) if len(z) else np.array([], complex)
    pb = np.concatenate(
        [ps + np.sqrt(ps * ps - wo * wo), ps - np.sqrt(ps * ps - wo * wo)]
    )
    zb = np.append(zb, np.zeros(deg))
    return zb, pb, k * bw**deg


def _lp2bs_zpk(z, p, k, wo, bw):
    deg = len(p) - len(z)
    zi = (bw / 2.0) / z if len(z) else np.array([], complex)
    pi = (bw / 2.0) / p
    zb = np.concatenate(
        [zi + np.sqrt(zi * zi - wo * wo), zi - np.sqrt(zi * zi - wo * wo)]
    ) if len(z) else np.array([], complex)
    pb = np.concatenate(
        [pi + np.sqrt(pi * pi - wo * wo), pi - np.sqrt(pi * pi - wo * wo)]
    )
    zb = np.concatenate([zb, np.full(deg, 1j * wo), np.full(deg, -1j * wo)])
    num = np.real(np.prod(-z)) if len(z) else 1.0
    k = k * num / np.real(np.prod(-p))
    return zb, pb, k


def _bilinear_zpk(z, p, k):
    """Bilinear s -> z with the prewarp convention s_cut = tan(pi*Wn/2)."""
    deg = len(p) - len(z)
    zd = (1.0 + z) / (1.0 - z) if len(z) else np.array([], complex)
    pd = (1.0 + p) / (1.0 - p)
    zd = np.append(zd, -np.ones(deg))
    num = np.real(np.prod(1.0 - z)) if len(z) else 1.0
    kd = k * num / np.real(np.prod(1.0 - p))
    return zd, pd, kd


# --- zpk -> SOS ----------------------------------------------------------------


def _split_conj(roots, tol=1e-8):
    """(conjugate-pair representatives, reals) from a conjugate-closed set."""
    roots = np.asarray(roots, complex)
    upper = sorted(
        (r for r in roots if r.imag > tol), key=lambda r: (r.real, r.imag)
    )
    reals = sorted(r.real for r in roots if abs(r.imag) <= tol)
    return upper, reals


def zpk2sos(z, p, k) -> np.ndarray:
    """Digital zpk -> scipy-layout SOS rows, gain distributed evenly.

    Pairing: conjugate pole pairs sorted by closeness to the unit circle
    (least-damped LAST in the cascade — the scipy ordering that keeps
    intermediate stages bounded); each pole pair takes the nearest
    available zero pair. Leftover reals pair among themselves.
    """
    z = np.asarray(z, complex)
    p = np.asarray(p, complex)
    n_sec = max((max(len(z), len(p)) + 1) // 2, 1)
    z = np.append(z, np.zeros(2 * n_sec - len(z)))
    p = np.append(p, np.zeros(2 * n_sec - len(p)))

    pu, pr = _split_conj(p)
    zu, zr = _split_conj(z)
    pole_pairs = [(c, np.conj(c)) for c in pu]
    for i in range(0, len(pr) - 1, 2):
        pole_pairs.append((pr[i] + 0j, pr[i + 1] + 0j))
    if len(pr) % 2:
        pole_pairs.append((pr[-1] + 0j, 0j))
    zero_pairs = [(c, np.conj(c)) for c in zu]
    for i in range(0, len(zr) - 1, 2):
        zero_pairs.append((zr[i] + 0j, zr[i + 1] + 0j))
    if len(zr) % 2:
        zero_pairs.append((zr[-1] + 0j, 0j))
    while len(zero_pairs) < n_sec:
        zero_pairs.append((0j, 0j))
    while len(pole_pairs) < n_sec:
        pole_pairs.append((0j, 0j))

    # least-damped pole pairs last, each grabbing its nearest zero pair
    pole_pairs.sort(key=lambda pp: abs(1.0 - abs(pp[0])), reverse=True)
    rows = []
    remaining = list(zero_pairs)
    for pp in pole_pairs:
        j = min(
            range(len(remaining)), key=lambda i: abs(remaining[i][0] - pp[0])
        )
        zz = remaining.pop(j)
        bb = np.array([1.0, -(zz[0] + zz[1]).real, (zz[0] * zz[1]).real])
        aa = np.array([1.0, -(pp[0] + pp[1]).real, (pp[0] * pp[1]).real])
        rows.append(np.concatenate([bb, aa]))
    g = abs(k) ** (1.0 / n_sec) * np.sign(k)
    sos = np.asarray(rows, np.float64)
    sos[:, :3] *= g
    return sos.astype(np.float32)


# --- public surface -------------------------------------------------------------


_PROTOS = {
    "butter": lambda n, rp, rs: butter_zpk_proto(n),
    "cheby1": lambda n, rp, rs: _cheby1_zpk_proto(n, rp),
    "cheby2": lambda n, rp, rs: _cheby2_zpk_proto(n, rs),
    "ellip": lambda n, rp, rs: _ellip_zpk_proto(n, rp, rs),
}


def iirfilter(
    order: int,
    Wn,
    *,
    btype: str = "lowpass",
    ftype: str = "butter",
    rp: float | None = None,
    rs: float | None = None,
) -> np.ndarray:
    """Classical IIR design -> SOS rows (scipy.signal.iirfilter-compatible).

    ``Wn``: cutoff in (0, 1) Nyquist units — a scalar for lowpass/highpass,
    a (low, high) pair for bandpass/bandstop. ``rp``: passband ripple dB
    (cheby1/ellip); ``rs``: stopband attenuation dB (cheby2/ellip).
    Magnitude response matches scipy.signal.iirfilter(output='sos') across
    the tests' spec grid (tests/test_design_spectral.py).
    """
    if order < 1:
        raise ValueError(f"order must be >= 1, got {order}")
    if ftype not in _PROTOS:
        raise ValueError(f"ftype must be one of {sorted(_PROTOS)}, got {ftype!r}")
    if ftype in ("cheby1", "ellip") and (rp is None or rp <= 0):
        raise ValueError(f"{ftype} needs passband ripple rp > 0 dB, got {rp}")
    if ftype in ("cheby2", "ellip") and (rs is None or rs <= 0):
        raise ValueError(f"{ftype} needs stopband attenuation rs > 0 dB, got {rs}")
    z, p, k = _PROTOS[ftype](order, rp, rs)

    if btype in ("lowpass", "highpass"):
        wn = float(np.squeeze(np.asarray(Wn)))
        if not 0.0 < wn < 1.0:
            raise ValueError(f"Wn must be in (0,1) of Nyquist, got {Wn}")
        warped = np.tan(np.pi * wn / 2.0)
        if btype == "lowpass":
            z, p, k = _lp2lp_zpk(z, p, k, warped)
        else:
            z, p, k = _lp2hp_zpk(z, p, k, warped)
    elif btype in ("bandpass", "bandstop"):
        lo, hi = (float(v) for v in np.asarray(Wn).reshape(2))
        if not 0.0 < lo < hi < 1.0:
            raise ValueError(f"need 0 < low < high < 1 (Nyquist), got {Wn}")
        w1, w2 = np.tan(np.pi * lo / 2.0), np.tan(np.pi * hi / 2.0)
        wo, bw = np.sqrt(w1 * w2), w2 - w1
        if btype == "bandpass":
            z, p, k = _lp2bp_zpk(z, p, k, wo, bw)
        else:
            z, p, k = _lp2bs_zpk(z, p, k, wo, bw)
    else:
        raise ValueError(
            "btype must be lowpass/highpass/bandpass/bandstop, "
            f"got {btype!r}"
        )
    z, p, k = _bilinear_zpk(z, p, k)
    return zpk2sos(z, p, k)


def design_elliptic(
    order: int, rp_db: float, rs_db: float, Wn, btype: str = "lowpass"
) -> np.ndarray:
    """Elliptic (Cauer) digital filter as an SOS cascade (scipy layout).

    Steepest classical rolloff for a given order: equiripple in BOTH bands
    (``rp_db`` passband ripple, ``rs_db`` stopband attenuation). Matches
    scipy.signal.ellip's magnitude response (tests/test_design_spectral.py).
    """
    return iirfilter(order, Wn, btype=btype, ftype="ellip", rp=rp_db, rs=rs_db)
