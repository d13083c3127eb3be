"""LTI representation/discretization/simulation and partial-fraction
tests — scipy.signal is the oracle throughout."""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.signal as sps

from digital_signal_processsing_tpu.ops import lti
from digital_signal_processsing_tpu.ops import correlate as corr


TFS = [
    ([1.0, 3.0, 3.0], [1.0, 2.0, 1.0]),
    ([2.0], [1.0, 0.4, 0.2]),
    ([1.0, 0.5], [2.0, 1.0, 0.3, 0.1]),
    ([1.0, 2.0, 3.0, 4.0], [1.0, 0.5, 0.25, 0.125]),
]


@pytest.mark.parametrize("b,a", TFS)
def test_tf2ss_ss2tf_match_scipy(b, a):
    A, B, C, D = lti.tf2ss(b, a)
    for got, ref in zip((A, B, C, D), sps.tf2ss(b, a)):
        assert np.allclose(got, ref, atol=1e-12)
    num, den = lti.ss2tf(A, B, C, D)
    numr, denr = sps.ss2tf(*sps.tf2ss(b, a))
    assert np.allclose(num, numr, atol=1e-9)
    assert np.allclose(den, denr, atol=1e-9)


def test_zpk_ss_round_trip():
    z, p, k = [0.5, -0.5], [0.9, 0.2, -0.3], 2.0
    got = lti.zpk2ss(z, p, k)
    for g, r in zip(got, sps.zpk2ss(z, p, k)):
        assert np.allclose(g, r, atol=1e-12)
    z2, p2, k2 = lti.ss2zpk(*got)
    assert np.allclose(sorted(np.real(z2)), sorted(z), atol=1e-8)
    assert abs(k2 - k) < 1e-8


def test_abcd_normalize_fills_zeros():
    A = np.eye(2)
    C = np.ones((1, 2))
    Af, Bf, Cf, Df = lti.abcd_normalize(A=A, C=C, D=np.zeros((1, 3)))
    assert Bf.shape == (2, 3) and np.all(Bf == 0)
    with pytest.raises(ValueError):
        lti.abcd_normalize(A=A)


CT_SYS = (
    np.array([[0.0, 1.0], [-4.0, -0.5]]),
    np.array([[0.0], [1.0]]),
    np.array([[1.0, 0.0]]),
    np.array([[0.0]]),
)


@pytest.mark.parametrize(
    "method,alpha",
    [
        ("zoh", None),
        ("foh", None),
        ("impulse", None),
        ("bilinear", None),
        ("euler", None),
        ("backward_diff", None),
        ("gbt", 0.3),
    ],
)
def test_cont2discrete_matches_scipy(method, alpha):
    kw = {"alpha": alpha} if alpha is not None else {}
    ref = sps.cont2discrete(CT_SYS, 0.05, method=method, **kw)
    got = lti.cont2discrete(CT_SYS, 0.05, method=method, **kw)
    for mg, mr in zip(got[:4], ref[:4]):
        assert np.allclose(mg, mr, atol=1e-10), method


def test_dlsim_dstep_dimpulse_match_scipy():
    sysd = sps.cont2discrete(CT_SYS, 0.05, method="zoh")
    u = np.random.default_rng(0).standard_normal(200)
    _, yref, xref = sps.dlsim(sysd, u)
    y, x = lti.dlsim(sysd, u)
    assert np.allclose(np.asarray(y), yref, atol=1e-4)
    assert np.allclose(np.asarray(x), xref, atol=1e-4)
    _, (ysr,) = sps.dstep(sysd, n=50)
    _, ys = lti.dstep(sysd, 50)
    assert np.allclose(np.asarray(ys)[:, 0], ysr[:, 0], atol=1e-4)
    _, (yir,) = sps.dimpulse(sysd, n=50)
    _, yi = lti.dimpulse(sysd, 50)
    assert np.allclose(np.asarray(yi)[:, 0], yir[:, 0], atol=1e-4)


def _canon(r, p):
    order = np.lexsort((np.imag(p), np.real(p)))
    return np.asarray(r)[order], np.asarray(p)[order]


@pytest.mark.parametrize(
    "b,a",
    [
        ([-4.0, 8.0], [1.0, 6.0, 8.0]),
        ([1.0, 2.0], [1.0, 5.0, 8.0, 4.0]),  # repeated pole
        ([5.0, 3.0, -2.0, 7.0], [-4.0, 0.0, 8.0, 3.0]),  # improper
        ([1.0], [1.0, 4.0, 6.0, 4.0, 1.0]),  # (s+1)^4
    ],
)
def test_residue_invres_match_scipy(b, a):
    r_ref, p_ref, k_ref = sps.residue(b, a)
    r, p, k = lti.residue(b, a)
    rr, pr = _canon(r_ref, p_ref)
    rg, pg = _canon(r, p)
    assert np.allclose(pr, pg, atol=1e-6)
    assert np.allclose(rr, rg, atol=1e-5)
    b2, a2 = lti.invres(r, p, k)
    bn = np.asarray(b2, float) / np.asarray(a2, float)[0]
    an = np.asarray(a2, float) / np.asarray(a2, float)[0]
    bs = np.asarray(b, float) / np.asarray(a, float)[0]
    assert np.allclose(
        np.trim_zeros(bn, "f"), np.trim_zeros(bs, "f"), atol=1e-6
    )
    assert np.allclose(an, np.asarray(a, float) / a[0], atol=1e-6)


@pytest.mark.parametrize(
    "b,a",
    [
        ([1.0, -1.0], [1.0, -1.4, 0.48]),
        ([1.0], [1.0, -1.0, 0.25]),  # repeated 0.5
        ([2.0, 1.0, 0.0, -2.0], [1.0, -0.5]),  # direct terms
    ],
)
def test_residuez_invresz_match_scipy(b, a):
    r_ref, p_ref, k_ref = sps.residuez(b, a)
    r, p, k = lti.residuez(b, a)
    rr, pr = _canon(r_ref, p_ref)
    rg, pg = _canon(r, p)
    assert np.allclose(pr, pg, atol=1e-6)
    assert np.allclose(rr, rg, atol=1e-5)
    kr = np.atleast_1d(k_ref) if np.size(k_ref) else np.zeros(0)
    kg = np.atleast_1d(k) if np.size(k) else np.zeros(0)
    assert kr.size == kg.size and np.allclose(kr, kg, atol=1e-8)
    b2, a2 = lti.invresz(r, p, k)
    br_, ar_ = sps.invresz(r_ref, p_ref, k_ref)
    assert np.allclose(np.asarray(b2, float), br_, atol=1e-6)
    assert np.allclose(np.asarray(a2, float), ar_, atol=1e-6)


def test_unique_roots_grouping():
    p = np.array([1.0, 1.0005, 2.0, 2.0, 3.0])
    u, m = lti.unique_roots(p, tol=1e-2, rtype="avg")
    assert sorted(m.tolist()) == [1, 2, 2]
    assert np.allclose(sorted(u), [1.00025, 2.0, 3.0])


def test_freqz_zpk_matches_scipy():
    w, h = lti.freqz_zpk([0.5], [0.8, -0.4], 1.5, worN=256)
    wr, hr = sps.freqz_zpk([0.5], [0.8, -0.4], 1.5, worN=256)
    assert np.allclose(w, wr)
    assert np.allclose(h, hr, atol=1e-10)


@pytest.mark.parametrize("n1,n2", [(10, 10), (10, 7), (7, 10), (8, 5)])
@pytest.mark.parametrize("mode", ["full", "same", "valid"])
def test_correlation_lags_matches_scipy(n1, n2, mode):
    assert np.array_equal(
        corr.correlation_lags(n1, n2, mode),
        sps.correlation_lags(n1, n2, mode),
    )


def test_vectorstrength_matches_scipy():
    rng = np.random.default_rng(0)
    events = np.sort(rng.uniform(0, 100, 400))
    for period in (1.0, [0.5, 1.0, 2.3]):
        sr, pr = sps.vectorstrength(events, period)
        sg, pg = corr.vectorstrength(events, period)
        assert np.allclose(np.asarray(sg), sr, atol=1e-4)
        assert np.allclose(np.asarray(pg), pr, atol=1e-4)


def test_lsim_matches_scipy_both_holds():
    rng = np.random.default_rng(0)
    T = np.linspace(0, 10, 501)
    U = np.sin(2 * np.pi * 0.3 * T) + 0.3 * rng.standard_normal(T.size)
    for interp in (True, False):
        _, yr, _ = sps.lsim(CT_SYS, U, T, interp=interp)
        _, yg, _ = lti.lsim(CT_SYS, U, T, interp=interp)
        # float32 device scan vs scipy float64
        assert (
            np.max(np.abs(np.asarray(yg) - yr)) / np.max(np.abs(yr)) < 1e-3
        ), interp
    with pytest.raises(ValueError):
        lti.lsim(CT_SYS, U[:4], np.array([0.0, 0.1, 0.3, 0.35]))


def test_impulse_step_match_scipy():
    T = np.linspace(0, 10, 501)
    _, yr = sps.impulse(CT_SYS, T=T)
    _, yg = lti.impulse(CT_SYS, T=T)
    assert np.max(np.abs(np.asarray(yg) - yr)) / np.max(np.abs(yr)) < 1e-3
    _, yr = sps.step(CT_SYS, T=T)
    _, yg = lti.step(CT_SYS, T=T)
    assert np.max(np.abs(np.asarray(yg) - yr)) / np.max(np.abs(yr)) < 1e-3
    tr, _ = sps.impulse(CT_SYS)
    tg, _ = lti.impulse(CT_SYS)
    assert np.isclose(tr[-1], tg[-1])  # same default-horizon heuristic


def test_freqresp_bode_match_scipy():
    b, a = [1.0, 3.0], [1.0, 2.0, 10.0]
    wr, hr = sps.freqresp((b, a), n=200)
    wg, hg = lti.freqresp((b, a), n=200)
    assert np.allclose(wr, wg) and np.allclose(hr, hg)
    wr, hr = sps.freqresp(CT_SYS, w=np.logspace(-1, 2, 60))
    wg, hg = lti.freqresp(CT_SYS, w=np.logspace(-1, 2, 60))
    assert np.allclose(hr, hg, rtol=1e-8)
    zpk = ([0.5j, -0.5j], [-1 + 2j, -1 - 2j], 1.5)
    wr, hr = sps.freqresp(zpk, w=np.logspace(-1, 1, 30))
    wg, hg = lti.freqresp(zpk, w=np.logspace(-1, 1, 30))
    assert np.allclose(hr, hg, rtol=1e-9)
    wr, mr, ph_r = sps.bode((b, a), n=80)
    wg, mg, ph_g = lti.bode((b, a), n=80)
    assert np.allclose(mr, mg, atol=1e-8)
    assert np.allclose(ph_r, ph_g, atol=1e-6)


def test_dfreqresp_dbode_match_scipy():
    sysd = sps.cont2discrete(CT_SYS, 0.05, method="bilinear")
    bd, ad = sps.ss2tf(*[np.atleast_2d(m) for m in sysd[:4]])
    tfd = (bd[0], ad, 0.05)
    wr, hr = sps.dfreqresp(tfd, n=128)
    wg, hg = lti.dfreqresp(tfd, n=128)
    assert np.allclose(wr, wg) and np.allclose(hr, hg, atol=1e-9)
    ssd = tuple(list(sysd))
    wr, hr = sps.dfreqresp(ssd, n=64)
    wg, hg = lti.dfreqresp(ssd, n=64)
    assert np.allclose(wr, wg) and np.allclose(hr, hg, atol=1e-7)
    wr, mr, ph_r = sps.dbode(tfd, n=50)
    wg, mg, ph_g = lti.dbode(tfd, n=50)
    assert np.allclose(wr, wg)
    assert np.allclose(mr, mg, atol=1e-7)
    assert np.allclose(ph_r, ph_g, atol=1e-5)


def test_class_api_continuous():
    sys_tf = lti.lti([1.0, 3.0], [1.0, 2.0, 10.0])
    ref = sps.lti([1.0, 3.0], [1.0, 2.0, 10.0])
    assert np.allclose(
        sorted(np.round(sys_tf.poles, 6)), sorted(np.round(ref.poles, 6))
    )
    assert np.allclose(
        sorted(np.round(sys_tf.zeros, 6)), sorted(np.round(ref.zeros, 6))
    )
    assert abs(sys_tf.dcgain() - 0.3) < 1e-9
    T = np.linspace(0, 10, 301)
    _, yg = sys_tf.step(T=T)
    _, yr = ref.step(T=T)
    assert np.max(np.abs(np.asarray(yg) - yr)) / np.max(np.abs(yr)) < 1e-3
    _, mg, phg = sys_tf.bode(n=60)
    _, mr, phr = ref.bode(n=60)
    assert np.allclose(mg, mr, atol=1e-6)
    assert np.allclose(phg, phr, atol=1e-5)
    _, hg = sys_tf.freqresp(n=50)
    _, hr = ref.freqresp(n=50)
    assert np.allclose(hg, hr)
    U = np.sin(T)
    _, yg, _ = sys_tf.output(U, T)
    _, yr, _ = ref.output(U, T)
    assert np.max(np.abs(np.asarray(yg) - yr)) / np.max(np.abs(yr)) < 1e-3
    # representation round trip preserves the response
    back = sys_tf.to_ss().to_zpk().to_tf()
    _, h2 = back.freqresp(w=np.logspace(-1, 2, 40))
    _, h1 = sys_tf.freqresp(w=np.logspace(-1, 2, 40))
    assert np.allclose(h1, h2, rtol=1e-6)
    with pytest.raises(ValueError):
        lti.lti([1.0])


def test_class_api_discrete():
    dsys = lti.dlti([0.2, 0.1], [1.0, -0.7], dt=0.5)
    dref = sps.dlti([0.2, 0.1], [1.0, -0.7], dt=0.5)
    tg, yg = dsys.step(N=40)
    tr, (yr,) = dref.step(n=40)
    assert np.allclose(np.asarray(yg)[:, 0], yr[:, 0], atol=1e-4)
    assert np.allclose(tg, tr)
    _, yi = dsys.impulse(N=30)
    _, (yri,) = dref.impulse(n=30)
    assert np.allclose(np.asarray(yi)[:, 0], yri[:, 0], atol=1e-5)
    wg, hg = dsys.freqresp(n=32)
    wr, hr = dref.freqresp(n=32)
    assert np.allclose(wg, wr) and np.allclose(hg, hr, atol=1e-6)
    wg, mg, _ = dsys.bode(n=32)
    wr, mr, _ = dref.bode(n=32)
    assert np.allclose(wg, wr) and np.allclose(mg, mr, atol=1e-5)
    # output() dispatches to dlsim for discrete systems
    _, yd, _ = dsys.output(np.ones(5), np.arange(5) * 0.5)
    assert np.asarray(yd).shape[0] == 5
    # continuous-only guard
    with pytest.raises(ValueError):
        lti._LTIBase._check_continuous(dsys)


def test_place_poles_siso_matches_scipy_gain():
    A = np.array([[0.0, 1.0], [-2.0, -3.0]])
    B = np.array([[0.0], [1.0]])
    want = np.array([-5.0 + 1j, -5.0 - 1j])
    res = lti.place_poles(A, B, want)
    ref = sps.place_poles(A, B, want)
    assert np.allclose(res.gain_matrix, ref.gain_matrix, atol=1e-8)
    assert np.allclose(
        np.sort_complex(res.computed_poles), np.sort_complex(want), atol=1e-8
    )


def test_place_poles_mimo_places_and_validates():
    rng = np.random.default_rng(0)
    A = rng.standard_normal((4, 4))
    B = rng.standard_normal((4, 2))
    want = np.array([-1.0, -2.0, -3.0 + 0.5j, -3.0 - 0.5j])
    res = lti.place_poles(A, B, want)
    assert np.allclose(
        np.sort_complex(res.computed_poles), np.sort_complex(want), atol=1e-5
    )
    with pytest.raises(ValueError):
        lti.place_poles(np.diag([1.0, 2.0]), np.array([[1.0], [0.0]]),
                        [-1.0, -2.0])  # uncontrollable
    with pytest.raises(ValueError):
        lti.place_poles(A, B, [-1.0, -2.0, -3.0 + 1j, -4.0])  # not conjugate
