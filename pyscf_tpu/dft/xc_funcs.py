"""Exchange-correlation energy densities in JAX.

TPU-native replacement for libxc/xcfun (reference pyscf/dft/libxc.py:47
ctypes bridge -> external C library): functionals are implemented as pure
jnp expressions of (rho_a, rho_b, sigma_aa, sigma_ab, sigma_bb, [tau]);
all potentials/kernels (vxc, fxc) come from jax.grad -- replacing libxc's
hand-coded derivative tables and xcfun's autodiff.

Conventions: every function returns the energy density per unit volume
e(r) such that Exc = int e(r) d3r.  Spin-unpolarized callers pass
rho_a = rho_b = rho/2, sigma_* = |grad rho|^2/4.

References for the formulas (public literature):
  Slater exchange; VWN3/VWN5: Vosko, Wilk, Nusair, Can. J. Phys. 58, 1200;
  B88: Becke PRA 38, 3098; LYP: Lee, Yang, Parr PRB 37, 785 (Miehlich form);
  PBE: Perdew, Burke, Ernzerhof PRL 77, 3865; PW91 LDA: Perdew-Wang PRB 45,
  13244; TPSS: PRL 91, 146401.
"""
import jax.numpy as jnp

_TINY = 1e-30


def _rs(rho):
    return (3.0 / (4.0 * jnp.pi * jnp.maximum(rho, _TINY))) ** (1.0 / 3.0)


def _safe_p(sig, n):
    """Reduced gradient p = s^2 = sig / (4 (3 pi^2)^(2/3) n^(8/3)).

    Evaluated in log space: the naive quotient's reverse-mode rule squares
    the denominator (~n^(16/3)), which lands in the float32 subnormal range
    at valid low-density grid points and is flushed to zero by XLA,
    producing inf/NaN gradients in the fused SCF f32 pre-stage.  exp/log
    keeps every intermediate normal (inputs are pre-clamped > 0)."""
    c = 4.0 * (3.0 * jnp.pi ** 2) ** (2.0 / 3.0)
    return jnp.exp(jnp.log(sig) - (8.0 / 3.0) * jnp.log(n)) / c


# ---------------------------------------------------------------------------
# LDA exchange
# ---------------------------------------------------------------------------

_CX = -(3.0 / 4.0) * (3.0 / jnp.pi) ** (1.0 / 3.0)


def lda_x(rho_a, rho_b):
    """Slater exchange, spin-scaled."""
    e = 0.0
    for r in (rho_a, rho_b):
        r2 = jnp.maximum(2.0 * r, _TINY)
        e = e + 0.5 * _CX * r2 ** (4.0 / 3.0)
    return e


# ---------------------------------------------------------------------------
# VWN correlation (parametrization III/RPA and V)
# ---------------------------------------------------------------------------

def _vwn_eps(rs, A, x0, b, c):
    x = jnp.sqrt(rs)
    X = x * x + b * x + c
    X0 = x0 * x0 + b * x0 + c
    Q = jnp.sqrt(4 * c - b * b)
    atanq = jnp.arctan(Q / (2 * x + b))
    return A * (jnp.log(x * x / X) + 2 * b / Q * atanq
                - b * x0 / X0 * (jnp.log((x - x0) ** 2 / X)
                                 + 2 * (b + 2 * x0) / Q * atanq))


# VWN5 parameters: paramagnetic, ferromagnetic, spin stiffness
_VWN5_P = (0.0310907, -0.10498, 3.72744, 12.9352)
_VWN5_F = (0.01554535, -0.32500, 7.06042, 18.0578)
_VWN5_A = (-1.0 / (6.0 * jnp.pi * jnp.pi), -0.00475840, 1.13107, 13.0045)

# VWN3 (RPA) parameters
_VWN3_P = (0.0310907, -0.409286, 13.0720, 42.7198)
_VWN3_F = (0.01554535, -0.743294, 20.1231, 101.578)


def _f_zeta(zeta):
    return (((1 + zeta) ** (4.0 / 3.0) + (1 - zeta) ** (4.0 / 3.0) - 2.0)
            / (2.0 ** (4.0 / 3.0) - 2.0))


def vwn5_c(rho_a, rho_b):
    rho = jnp.maximum(rho_a + rho_b, _TINY)
    zeta = jnp.clip((rho_a - rho_b) / rho, -1 + 1e-15, 1 - 1e-15)
    rs = _rs(rho)
    ep = _vwn_eps(rs, *_VWN5_P)
    ef = _vwn_eps(rs, *_VWN5_F)
    ea = _vwn_eps(rs, *_VWN5_A)
    f = _f_zeta(zeta)
    fpp0 = 4.0 / (9.0 * (2.0 ** (1.0 / 3.0) - 1.0))
    z4 = zeta ** 4
    eps = ep + ea * f / fpp0 * (1 - z4) + (ef - ep) * f * z4
    return rho * eps


def vwn3_c(rho_a, rho_b):
    """VWN III (RPA) — the correlation used inside the original B3LYP."""
    rho = jnp.maximum(rho_a + rho_b, _TINY)
    zeta = jnp.clip((rho_a - rho_b) / rho, -1 + 1e-15, 1 - 1e-15)
    rs = _rs(rho)
    ep = _vwn_eps(rs, *_VWN3_P)
    ef = _vwn_eps(rs, *_VWN3_F)
    f = _f_zeta(zeta)
    eps = ep + (ef - ep) * f
    return rho * eps


# ---------------------------------------------------------------------------
# PW92 LDA correlation (basis of PBE)
# ---------------------------------------------------------------------------

def _pw92_g(rs, A, a1, b1, b2, b3, b4):
    s = jnp.sqrt(rs)
    den = 2.0 * A * (b1 * s + b2 * rs + b3 * rs * s + b4 * rs * rs)
    return -2.0 * A * (1 + a1 * rs) * jnp.log1p(1.0 / jnp.maximum(den, _TINY))


def pw92_eps(rho_a, rho_b):
    rho = jnp.maximum(rho_a + rho_b, _TINY)
    zeta = jnp.clip((rho_a - rho_b) / rho, -1 + 1e-15, 1 - 1e-15)
    rs = _rs(rho)
    e0 = _pw92_g(rs, 0.031091, 0.21370, 7.5957, 3.5876, 1.6382, 0.49294)
    e1 = _pw92_g(rs, 0.015545, 0.20548, 14.1189, 6.1977, 3.3662, 0.62517)
    alc = -_pw92_g(rs, 0.016887, 0.11125, 10.357, 3.6231, 0.88026, 0.49671)
    f = _f_zeta(zeta)
    fpp0 = 1.709920934161365617563962776245
    z4 = zeta ** 4
    return e0 + alc * f / fpp0 * (1 - z4) + (e1 - e0) * f * z4


def pw92_c(rho_a, rho_b):
    return (rho_a + rho_b) * pw92_eps(rho_a, rho_b)


# ---------------------------------------------------------------------------
# GGA exchange: B88, PBE
# ---------------------------------------------------------------------------

def b88_x(rho_a, rho_b, sigma_aa, sigma_bb):
    beta = 0.0042
    e = 0.0
    for r, s in ((rho_a, sigma_aa), (rho_b, sigma_bb)):
        r = jnp.maximum(r, _TINY)
        r43 = r ** (4.0 / 3.0)
        x = jnp.sqrt(jnp.maximum(s, _TINY)) / r43
        lda = -(3.0 / 2.0) * (3.0 / (4 * jnp.pi)) ** (1.0 / 3.0) * r43
        corr = -beta * r43 * x * x / (1 + 6 * beta * x * jnp.arcsinh(x))
        e = e + lda + corr
    return e


def pbe_x(rho_a, rho_b, sigma_aa, sigma_bb):
    kappa, mu = 0.8040, 0.2195149727645171
    e = 0.0
    for r, s in ((rho_a, sigma_aa), (rho_b, sigma_bb)):
        r2 = jnp.maximum(2.0 * r, _TINY)
        s2 = 4.0 * jnp.maximum(s, 0.0)
        kf = (3.0 * jnp.pi ** 2 * r2) ** (1.0 / 3.0)
        # s^2 without sqrt (autodiff-safe at sigma = 0)
        ss2 = s2 / (2.0 * kf * r2) ** 2
        fx = 1 + kappa - kappa / (1 + mu * ss2 / kappa)
        ex_lda = _CX * r2 ** (4.0 / 3.0)
        e = e + 0.5 * ex_lda * fx
    return e


def pbe_c(rho_a, rho_b, sigma):
    """PBE correlation; sigma = |grad rho_total|^2."""
    rho = jnp.maximum(rho_a + rho_b, _TINY)
    zeta = jnp.clip((rho_a - rho_b) / rho, -1 + 1e-15, 1 - 1e-15)
    eps = pw92_eps(rho_a, rho_b)
    beta, gamma = 0.06672455060314922, (1 - jnp.log(2.0)) / jnp.pi ** 2
    phi = 0.5 * ((1 + zeta) ** (2.0 / 3.0) + (1 - zeta) ** (2.0 / 3.0))
    kf = (3.0 * jnp.pi ** 2 * rho) ** (1.0 / 3.0)
    ks = jnp.sqrt(4.0 * kf / jnp.pi)
    t2 = jnp.maximum(sigma, 0.0) / (2.0 * phi * ks * rho) ** 2
    # A = (beta/gamma) / (exp(-eps/(gamma phi^3)) - 1), via expm1 for stability
    A = beta / gamma / jnp.maximum(jnp.expm1(-eps / (gamma * phi ** 3)),
                                   _TINY)
    u = A * t2
    H = gamma * phi ** 3 * jnp.log1p(
        beta / gamma * t2 * (1.0 + u) / (1.0 + u + u * u))
    return rho * (eps + H)


# ---------------------------------------------------------------------------
# LYP correlation (Miehlich et al. CPL 157, 200 form)
# ---------------------------------------------------------------------------

def lyp_c(rho_a, rho_b, sigma_aa, sigma_ab, sigma_bb):
    a, b, c, d = 0.04918, 0.132, 0.2533, 0.349
    rho = jnp.maximum(rho_a + rho_b, _TINY)
    rm3 = rho ** (-1.0 / 3.0)
    w = jnp.exp(-c * rm3) / (1 + d * rm3) * rm3 ** 11
    dl = c * rm3 + d * rm3 / (1 + d * rm3)
    cf = 0.3 * (3.0 * jnp.pi ** 2) ** (2.0 / 3.0)
    gaa, gab, gbb = sigma_aa, sigma_ab, sigma_bb
    ra, rb = jnp.maximum(rho_a, _TINY), jnp.maximum(rho_b, _TINY)
    e = -a * (4.0 * ra * rb / (rho * (1 + d * rm3))
              + b * w * (
        ra * rb * (
            2 ** (11.0 / 3.0) * cf * (ra ** (8.0 / 3.0) + rb ** (8.0 / 3.0))
            + (47.0 / 18.0 - 7.0 / 18.0 * dl) * (gaa + 2 * gab + gbb)
            - (2.5 - dl / 18.0) * (gaa + gbb)
            - (dl - 11.0) / 9.0 * (ra / rho * gaa + rb / rho * gbb))
        - 2.0 / 3.0 * rho * rho * (gaa + 2 * gab + gbb)
        + (2.0 / 3.0 * rho * rho - ra * ra) * gbb
        + (2.0 / 3.0 * rho * rho - rb * rb) * gaa))
    return e


# ---------------------------------------------------------------------------
# PW91 exchange and correlation (Perdew-Wang 1991)
# ---------------------------------------------------------------------------

def pw91_x(rho_a, rho_b, sigma_aa, sigma_bb):
    """PW91 exchange (JP Perdew et al., PRB 46, 6671 (1992))."""
    e = 0.0
    for r, sg in ((rho_a, sigma_aa), (rho_b, sigma_bb)):
        r2 = jnp.maximum(2.0 * r, _TINY)
        s2g = 4.0 * jnp.maximum(sg, _TINY)
        kf = (3.0 * jnp.pi ** 2 * r2) ** (1.0 / 3.0)
        s = jnp.sqrt(s2g) / (2.0 * kf * r2)
        s2 = s * s
        s4 = s2 * s2
        num = (1.0 + 0.19645 * s * jnp.arcsinh(7.7956 * s)
               + (0.2743 - 0.1508 * jnp.exp(-100.0 * s2)) * s2)
        den = (1.0 + 0.19645 * s * jnp.arcsinh(7.7956 * s) + 0.004 * s4)
        fx = num / den
        e = e + 0.5 * _CX * r2 ** (4.0 / 3.0) * fx
    return e


def pw91_c(rho_a, rho_b, sigma):
    """PW91 correlation (original GGA91 H0 + H1 form); sigma = |grad rho|^2."""
    rho = jnp.maximum(rho_a + rho_b, _TINY)
    zeta = jnp.clip((rho_a - rho_b) / rho, -1 + 1e-15, 1 - 1e-15)
    eps = pw92_eps(rho_a, rho_b)
    phi = 0.5 * ((1 + zeta) ** (2.0 / 3.0) + (1 - zeta) ** (2.0 / 3.0))
    kf = (3.0 * jnp.pi ** 2 * rho) ** (1.0 / 3.0)
    ks = jnp.sqrt(4.0 * kf / jnp.pi)
    t2 = jnp.maximum(sigma, 0.0) / (2.0 * phi * ks * rho) ** 2
    t = jnp.sqrt(t2)
    rs = _rs(rho)
    alpha, cc0, cx = 0.09, 0.004235, -0.001667
    beta = 16.0 * (3.0 / jnp.pi) ** (1.0 / 3.0) / (16.0 * jnp.pi) * cc0 * 2
    # standard constants (PW91 paper): beta = nu*cc0, nu = (16/pi)(3 pi^2)^(1/3)
    nu = (16.0 / jnp.pi) * (3.0 * jnp.pi ** 2) ** (1.0 / 3.0)
    beta = nu * cc0
    A = (2.0 * alpha / beta
         / jnp.maximum(jnp.expm1(-2.0 * alpha * eps
                                 / (beta * beta * phi ** 3)), _TINY))
    at2 = A * t2
    H0 = (beta * beta * phi ** 3 / (2.0 * alpha)
          * jnp.log1p(2.0 * alpha / beta * t2 * (1 + at2)
                      / (1 + at2 + at2 * at2)))
    # Cc(rs): Rasolt-Geldart parametrization used in PW91
    cc = (2.568e-3 + 23.266e-3 * rs + 7.389e-6 * rs ** 2) / \
         (1.0 + 8.723 * rs + 0.472 * rs ** 2 + 7.389e-2 * rs ** 3) \
        * 1e3 / 1e3
    ccrs = -cx + (2.568e-3 + 23.266e-3 * rs + 7.389e-6 * rs * rs) / \
        (1.0 + 8.723 * rs + 0.472 * rs * rs + 7.389e-2 * rs ** 3) - cc0
    H1 = (nu * (ccrs) * t2 * phi ** 3
          * jnp.exp(-100.0 * phi ** 4 * (ks / kf) ** 2 * t2))
    return rho * (eps + H0 + H1)


# ---------------------------------------------------------------------------
# Range-separated (erf) attenuated exchange: ITYH scheme
# (Iikura, Tsuneda, Yanai, Hirao, JCP 115, 3540 (2001))
# ---------------------------------------------------------------------------

def _sr_attenuation(a):
    """F(a): fraction of exchange surviving erfc(w r)/r attenuation.

    a = w / (2 k_sigma). Stable limits: F(0)=1, F(inf)->1/(...)->0.
    """
    a = jnp.clip(a, 1e-10, 50.0)
    a2 = a * a
    # exp(-1/(4a^2)) underflows for small a -- clamp the exponent
    expf = jnp.exp(-jnp.minimum(1.0 / (4.0 * a2), 700.0))
    erfv = jax.scipy.special.erf(1.0 / (2.0 * a))
    return 1.0 - (8.0 / 3.0) * a * (
        jnp.sqrt(jnp.pi) * erfv - 3.0 * a + 4.0 * a ** 3
        + (2.0 * a - 4.0 * a ** 3) * expf)


def cam_b88_x(rho_a, rho_b, sigma_aa, sigma_bb, omega, alpha, beta):
    """B88 exchange with CAM 1/r12 partitioning: the DFT part keeps
    [1 - alpha - beta + beta*F(a_sigma)] of the full B88 energy density,
    with a_sigma = omega / (2 k_sigma), k_sigma = (9 pi / K_sigma)^(1/2)
    rho_sigma^(1/3) (generalized kF of the ITYH scheme). alpha/beta are
    the CAM HF fractions (SR-HF = alpha, LR-HF = alpha + beta)."""
    bbeta = 0.0042
    e = 0.0
    for r, s in ((rho_a, sigma_aa), (rho_b, sigma_bb)):
        r_ = jnp.maximum(r, _TINY)
        r43 = r_ ** (4.0 / 3.0)
        x = jnp.sqrt(jnp.maximum(s, _TINY)) / r43
        lda = -(3.0 / 2.0) * (3.0 / (4 * jnp.pi)) ** (1.0 / 3.0) * r43
        corr = -bbeta * r43 * x * x / (1 + 6 * bbeta * x * jnp.arcsinh(x))
        e_full = lda + corr                     # = -(1/2) r^(4/3) K
        K = jnp.maximum(-2.0 * e_full / r43, _TINY)
        k_sig = jnp.sqrt(9.0 * jnp.pi / K) * r_ ** (1.0 / 3.0)
        a = omega / (2.0 * k_sig)
        F = _sr_attenuation(a)
        e = e + e_full * (1.0 - alpha - beta + beta * F)
    return e


import jax  # noqa: E402  (erf in _sr_attenuation)


# ---------------------------------------------------------------------------
# TPSS meta-GGA (Tao, Perdew, Staroverov, Scuseria, PRL 91, 146401 (2003))
# ---------------------------------------------------------------------------

def _tpss_fx(n, sig, tau):
    """TPSS exchange enhancement for one spin-scaled density n (=2 rho_s)."""
    n = jnp.maximum(n, _TINY)
    sig = jnp.maximum(sig, _TINY)
    tau = jnp.maximum(tau, _TINY)
    kf2 = (3.0 * jnp.pi ** 2 * n) ** (2.0 / 3.0)
    p = _safe_p(sig, n)
    tau_w = sig / (8.0 * n)
    tau_u = 0.3 * kf2 * n
    z = jnp.clip(tau_w / tau, 0.0, 1.0)
    alpha = jnp.maximum((tau - tau_w) / tau_u, 0.0)
    b = 0.40
    qb = 0.45 * (alpha - 1.0) / jnp.sqrt(1.0 + b * alpha * (alpha - 1.0)) \
        + 2.0 * p / 3.0
    kappa, mu, c, e = 0.804, 0.21951, 1.59096, 1.537
    z2 = z * z
    t1 = (10.0 / 81.0 + c * z2 / (1.0 + z2) ** 2) * p
    t2 = (146.0 / 2025.0) * qb * qb
    t3 = -(73.0 / 405.0) * qb * jnp.sqrt(0.5 * (0.6 * z) ** 2 + 0.5 * p * p)
    t4 = (1.0 / kappa) * (10.0 / 81.0) ** 2 * p * p
    t5 = 2.0 * jnp.sqrt(e) * (10.0 / 81.0) * (0.6 * z) ** 2
    t6 = e * mu * p ** 3
    x = (t1 + t2 + t3 + t4 + t5 + t6) / (1.0 + jnp.sqrt(e) * p) ** 2
    return 1.0 + kappa - kappa / (1.0 + x / kappa)


def tpss_x(rho_a, rho_b, sigma_aa, sigma_bb, tau_a, tau_b):
    e = 0.0
    for r, s, t in ((rho_a, sigma_aa, tau_a), (rho_b, sigma_bb, tau_b)):
        n = jnp.maximum(2.0 * r, _TINY)
        fx = _tpss_fx(n, 4.0 * s, 2.0 * t)
        e = e + 0.5 * _CX * n ** (4.0 / 3.0) * fx
    return e


def _pbe_eps(rho_a, rho_b, sigma):
    """PBE correlation energy PER PARTICLE (eps, not density)."""
    return pbe_c(rho_a, rho_b, sigma) / jnp.maximum(rho_a + rho_b, _TINY)


# ---------------------------------------------------------------------------
# SCAN meta-GGA (Sun, Ruzsinszky, Perdew, PRL 115, 036402 (2015))
# ---------------------------------------------------------------------------

def _scan_falpha(alpha, c1, c2, d):
    """SCAN iso-orbital interpolation f(alpha): 1 at alpha=0, 0 at 1,
    -d*exp(c2/(1-alpha)) for alpha>1.  Written with clamped branches so
    autodiff stays finite across the alpha=1 seam.  The clamp distance is
    dtype-aware: a fixed 1e-9 rounds to exactly 1.0 in float32, making the
    unselected where-branch inf and poisoning reverse-mode gradients (the
    fused SCF f32 pre-stage runs this in single precision)."""
    eps = 32.0 * jnp.finfo(jnp.result_type(alpha, 1.0)).eps
    am = jnp.clip(alpha, 0.0, 1.0 - eps)
    f_lo = jnp.exp(-c1 * am / (1.0 - am))
    ap = jnp.maximum(alpha, 1.0 + eps)
    f_hi = -d * jnp.exp(c2 / (1.0 - ap))
    return jnp.where(alpha < 1.0, f_lo, f_hi)


def _scan_fx_spin(n, sig, tau):
    """SCAN exchange enhancement for one spin-scaled density n (=2 rho)."""
    n = jnp.maximum(n, _TINY)
    sig = jnp.maximum(sig, _TINY)
    tau = jnp.maximum(tau, _TINY)
    kf2 = (3.0 * jnp.pi ** 2 * n) ** (2.0 / 3.0)
    p = _safe_p(sig, n)
    s = jnp.sqrt(p)
    tau_w = sig / (8.0 * n)
    tau_u = 0.3 * kf2 * n
    alpha = jnp.maximum((tau - tau_w) / tau_u, 0.0)

    k1 = 0.065
    mu = 10.0 / 81.0
    b2 = jnp.sqrt(5913.0 / 405000.0)
    b1 = (511.0 / 13500.0) / (2.0 * b2)
    b3 = 0.5
    b4 = mu * mu / k1 - 1606.0 / 18225.0 - b1 * b1
    oma = 1.0 - alpha
    x = (mu * p * (1.0 + (b4 * p / mu) * jnp.exp(-jnp.abs(b4) * p / mu))
         + (b1 * p + b2 * oma * jnp.exp(-b3 * oma * oma)) ** 2)
    h1x = 1.0 + k1 - k1 / (1.0 + x / k1)
    h0x = 1.174
    fx = _scan_falpha(alpha, 0.667, 0.8, 1.24)
    a1 = 4.9479
    gx = 1.0 - jnp.exp(-a1 / jnp.sqrt(jnp.maximum(s, 1e-12)))
    return (h1x + fx * (h0x - h1x)) * gx


def scan_x(rho_a, rho_b, sigma_aa, sigma_bb, tau_a, tau_b):
    e = 0.0
    for r, s, t in ((rho_a, sigma_aa, tau_a), (rho_b, sigma_bb, tau_b)):
        n = jnp.maximum(2.0 * r, _TINY)
        fx = _scan_fx_spin(n, 4.0 * s, 2.0 * t)
        e = e + 0.5 * _CX * n ** (4.0 / 3.0) * fx
    return e


def scan_c(rho_a, rho_b, sigma_aa, sigma_ab, sigma_bb, tau_a, tau_b):
    rho = jnp.maximum(rho_a + rho_b, _TINY)
    sigma = jnp.maximum(sigma_aa + 2.0 * sigma_ab + sigma_bb, _TINY)
    tau = jnp.maximum(tau_a + tau_b, _TINY)
    zeta = jnp.clip((rho_a - rho_b) / rho, -1 + 1e-12, 1 - 1e-12)
    rs = _rs(rho)
    kf = (3.0 * jnp.pi ** 2 * rho) ** (1.0 / 3.0)
    p = _safe_p(sigma, rho)
    tau_w = sigma / (8.0 * rho)
    ds = 0.5 * ((1.0 + zeta) ** (5.0 / 3.0) + (1.0 - zeta) ** (5.0 / 3.0))
    tau_u = 0.3 * kf * kf * rho * ds
    alpha = jnp.maximum((tau - tau_w) / tau_u, 0.0)
    phi = 0.5 * ((1.0 + zeta) ** (2.0 / 3.0) + (1.0 - zeta) ** (2.0 / 3.0))

    # eps_c1: PW92 + SCAN's H1 gradient correction
    eps_lsda = pw92_eps(rho_a, rho_b)
    gamma = 0.031090690869654895
    w1 = jnp.exp(-eps_lsda / (gamma * phi ** 3)) - 1.0
    t2 = (3.0 * jnp.pi ** 2 / 16.0) ** (2.0 / 3.0) * p / (
        phi * phi * rs)
    beta = 0.066725 * (1.0 + 0.1 * rs) / (1.0 + 0.1778 * rs)
    y = beta / (gamma * jnp.maximum(w1, _TINY)) * t2
    gy = (1.0 + 4.0 * y) ** (-0.25)
    h1 = gamma * phi ** 3 * jnp.log(1.0 + w1 * (1.0 - gy))
    eps_c1 = eps_lsda + h1

    # eps_c0: single-orbital (alpha=0) limit
    b1c, b2c, b3c = 0.0285764, 0.0889, 0.125541
    eps_lda0 = -b1c / (1.0 + b2c * jnp.sqrt(rs) + b3c * rs)
    w0 = jnp.exp(-eps_lda0 / b1c) - 1.0
    chi_inf = 0.12802585262625815
    g_inf = (1.0 + 4.0 * chi_inf * p) ** (-0.25)
    h0 = b1c * jnp.log(1.0 + w0 * (1.0 - g_inf))
    dx_z = 0.5 * ((1.0 + zeta) ** (4.0 / 3.0) + (1.0 - zeta) ** (4.0 / 3.0))
    gc_z = (1.0 - 2.3631 * (dx_z - 1.0)) * (1.0 - zeta ** 12)
    eps_c0 = (eps_lda0 + h0) * gc_z

    fc = _scan_falpha(alpha, 0.64, 1.5, 0.7)
    eps = eps_c1 + fc * (eps_c0 - eps_c1)
    return rho * eps


def tpss_c(rho_a, rho_b, sigma_aa, sigma_ab, sigma_bb, tau_a, tau_b):
    """TPSS correlation (revPKZB-based)."""
    rho = jnp.maximum(rho_a + rho_b, _TINY)
    ra = jnp.maximum(rho_a, _TINY)
    rb = jnp.maximum(rho_b, _TINY)
    sigma = jnp.maximum(sigma_aa + 2.0 * sigma_ab + sigma_bb, _TINY)
    tau = jnp.maximum(tau_a + tau_b, _TINY)
    tau_w = sigma / (8.0 * rho)
    z = jnp.clip(tau_w / tau, 0.0, 1.0)
    zeta = jnp.clip((rho_a - rho_b) / rho, -1 + 1e-12, 1 - 1e-12)
    # |grad zeta|^2 from the spin sigmas
    gz2 = jnp.maximum(
        (4.0 * (rb * rb * sigma_aa - 2.0 * ra * rb * sigma_ab
                + ra * ra * sigma_bb)) / rho ** 4, 0.0)
    xi2 = gz2 / (4.0 * (3.0 * jnp.pi ** 2 * rho) ** (2.0 / 3.0))
    Cz = (0.53 + 0.87 * zeta ** 2 + 0.50 * zeta ** 4 + 2.26 * zeta ** 6) \
        / (1.0 + xi2 * ((1.0 + zeta) ** (-4.0 / 3.0)
                        + (1.0 - zeta) ** (-4.0 / 3.0)) / 2.0) ** 4
    eps_pbe = _pbe_eps(rho_a, rho_b, sigma)
    # per-spin "tilde" eps: PBE with only one spin density present
    eps_a = _pbe_eps(ra, jnp.zeros_like(ra) + _TINY, sigma_aa)
    eps_b = _pbe_eps(rb, jnp.zeros_like(rb) + _TINY, sigma_bb)
    eps_a = jnp.maximum(eps_a, eps_pbe)
    eps_b = jnp.maximum(eps_b, eps_pbe)
    z2 = z * z
    eps_rev = eps_pbe * (1.0 + Cz * z2) \
        - (1.0 + Cz) * z2 * (ra / rho * eps_a + rb / rho * eps_b)
    d = 2.8
    return rho * eps_rev * (1.0 + d * eps_rev * z2 * z)


# ---------------------------------------------------------------------------
# r2SCAN meta-GGA (Furness, Kaplan, Ning, Perdew, Sun, JPCL 11, 8208 (2020)
# + erratum JPCL 11, 9248).  Replaces SCAN's twisted iso-orbital indicator
# interpolation with a smooth polynomial on alpha-bar in [0, 2.5] and
# restores the 2nd-order gradient expansion with damped correction terms.
# Reference analog: external libxc (pyscf/dft/libxc.py); implemented here
# from the published equations.
# ---------------------------------------------------------------------------

_R2_ETA = 0.001
_R2_CETA = 20.0 / 27.0 + _R2_ETA * 5.0 / 3.0
_R2_DP2 = 0.361
_R2_K0 = 0.174
_R2_K1 = 0.065
_R2_CFX = (1.0, -0.667, -0.4445555, -0.663086601049, 1.451297044490,
           -0.887998041597, 0.234528941479, -0.023185843322)
_R2_CFC = (1.0, -0.64, -0.4352, -1.535685604549, 3.061560252175,
           -1.915710236206, 0.516884468372, -0.051848879792)
# f'(1) of the interpolation polynomials (used in the GE2-restoring terms)
_R2_DFX2 = sum(i * c for i, c in enumerate(_R2_CFX))    # -0.93530021...
_R2_DFC2 = sum(i * c for i, c in enumerate(_R2_CFC))    # -0.71140226...


def _r2_interp(alpha, coeffs, c2, d):
    """r2SCAN interpolation f(abar): degree-7 polynomial on [0, 2.5],
    -d*exp(c2/(1-abar)) beyond."""
    a = jnp.clip(alpha, 0.0, 2.5)
    poly = 0.0
    for c in reversed(coeffs):
        poly = poly * a + c
    ap = jnp.maximum(alpha, 2.5 + 1e-9)
    f_hi = -d * jnp.exp(c2 / (1.0 - ap))
    return jnp.where(alpha <= 2.5, poly, f_hi)


def _r2scan_fx_spin(n, sig, tau):
    """r2SCAN exchange enhancement for one spin-scaled density n (=2 rho)."""
    n = jnp.maximum(n, _TINY)
    sig = jnp.maximum(sig, _TINY)
    tau = jnp.maximum(tau, _TINY)
    kf2 = (3.0 * jnp.pi ** 2 * n) ** (2.0 / 3.0)
    p = _safe_p(sig, n)
    tau_w = sig / (8.0 * n)
    tau_u = 0.3 * kf2 * n
    abar = jnp.maximum((tau - tau_w) / (tau_u + _R2_ETA * tau_w), 0.0)

    mu = 10.0 / 81.0
    damp = jnp.exp(-p * p / _R2_DP2 ** 4)
    # C2x = fx'(1)*k0 cancels the spurious GE2 term of the interpolation
    c2x = _R2_DFX2 * _R2_K0
    x = (_R2_CETA * c2x * damp + mu) * p
    h1x = 1.0 + _R2_K1 - _R2_K1 / (1.0 + x / _R2_K1)
    h0x = 1.0 + _R2_K0
    fx = _r2_interp(abar, _R2_CFX, 0.8, 1.24)
    a1 = 4.9479
    gx = 1.0 - jnp.exp(-a1 / jnp.maximum(p, 1e-24) ** 0.25)
    return (h1x + fx * (h0x - h1x)) * gx


def r2scan_x(rho_a, rho_b, sigma_aa, sigma_bb, tau_a, tau_b):
    e = 0.0
    for r, s, t in ((rho_a, sigma_aa, tau_a), (rho_b, sigma_bb, tau_b)):
        n = jnp.maximum(2.0 * r, _TINY)
        fx = _r2scan_fx_spin(n, 4.0 * s, 2.0 * t)
        e = e + 0.5 * _CX * n ** (4.0 / 3.0) * fx
    return e


def r2scan_c(rho_a, rho_b, sigma_aa, sigma_ab, sigma_bb, tau_a, tau_b):
    import jax
    rho = jnp.maximum(rho_a + rho_b, _TINY)
    sigma = jnp.maximum(sigma_aa + 2.0 * sigma_ab + sigma_bb, _TINY)
    tau = jnp.maximum(tau_a + tau_b, _TINY)
    zeta = jnp.clip((rho_a - rho_b) / rho, -1 + 1e-12, 1 - 1e-12)
    rs = _rs(rho)
    kf = (3.0 * jnp.pi ** 2 * rho) ** (1.0 / 3.0)
    p = _safe_p(sigma, rho)
    tau_w = sigma / (8.0 * rho)
    ds = 0.5 * ((1.0 + zeta) ** (5.0 / 3.0) + (1.0 - zeta) ** (5.0 / 3.0))
    tau_u = 0.3 * kf * kf * rho * ds
    abar = jnp.maximum((tau - tau_w) / (tau_u + _R2_ETA * tau_w), 0.0)
    phi = 0.5 * ((1.0 + zeta) ** (2.0 / 3.0) + (1.0 - zeta) ** (2.0 / 3.0))
    phi3 = phi ** 3

    gamma = 0.031090690869654895
    eps_lsda = pw92_eps(rho_a, rho_b)
    # d eps_lsda / d rs at fixed zeta:  n_sigma  prop. rs^-3
    _, deps_lsda_drs = jax.jvp(pw92_eps, (rho_a, rho_b),
                               (-3.0 * rho_a / rs, -3.0 * rho_b / rs))
    w1 = jnp.exp(-eps_lsda / (gamma * phi3)) - 1.0
    t2 = (3.0 * jnp.pi ** 2 / 16.0) ** (2.0 / 3.0) * p / (phi * phi * rs)
    beta = 0.066725 * (1.0 + 0.1 * rs) / (1.0 + 0.1778 * rs)
    y = beta / (gamma * jnp.maximum(w1, _TINY)) * t2

    b1c, b2c, b3c = 0.0285764, 0.0889, 0.125541
    sq_rs = jnp.sqrt(rs)
    eps_lda0 = -b1c / (1.0 + b2c * sq_rs + b3c * rs)
    deps_lda0_drs = b1c * (0.5 * b2c / sq_rs + b3c) / (
        1.0 + b2c * sq_rs + b3c * rs) ** 2
    w0 = jnp.exp(-eps_lda0 / b1c) - 1.0
    chi_inf = 0.12802585262625815
    g_inf = (1.0 + 4.0 * chi_inf * p) ** (-0.25)
    h0 = b1c * jnp.log(1.0 + w0 * (1.0 - g_inf))
    dx_z = 0.5 * ((1.0 + zeta) ** (4.0 / 3.0) + (1.0 - zeta) ** (4.0 / 3.0))
    gc_z = (1.0 - 2.3631 * (dx_z - 1.0)) * (1.0 - zeta ** 12)
    eps_c0 = (eps_lda0 + h0) * gc_z

    # damped GE2-restoring shift of y (erratum form); Delta-eps is the
    # alpha-interpolation span at p=0 whose spurious 2nd-order term the
    # shift cancels at the integrated (by-parts) level
    damp = jnp.exp(-p * p / _R2_DP2 ** 4)
    dcdel = gc_z * eps_lda0 - eps_lsda
    ddcdel_drs = gc_z * deps_lda0_drs - deps_lsda_drs
    dy = (_R2_DFC2 / (27.0 * gamma * ds * phi3 * jnp.maximum(w1, _TINY))
          * (20.0 * rs * ddcdel_drs - 45.0 * _R2_ETA * dcdel) * p * damp)
    # the shifted argument can cross zero in low-density/tiny-w1 corners
    # (worse in the f32 SCF pre-stage) -- clamp so the fractional power
    # and its gradient stay finite; physically g_y in (0, 1]
    gy = jnp.maximum(1.0 + 4.0 * (y - dy), 1e-12) ** (-0.25)
    h1 = gamma * phi3 * jnp.log(1.0 + w1 * (1.0 - gy))
    eps_c1 = eps_lsda + h1

    fc = _r2_interp(abar, _R2_CFC, 1.5, 0.7)
    eps = eps_c1 + fc * (eps_c0 - eps_c1)
    return rho * eps


# ---------------------------------------------------------------------------
# B97-type power-series functionals with range separation: the omega-B97
# family (Chai & Head-Gordon, JCP 128, 084106 (2008); omega-B97X-V:
# Mardirossian & Head-Gordon, PCCP 16, 9904 (2014)).
# Reference analog: external libxc HYB_GGA_XC_WB97* (pyscf/dft/libxc.py).
#
# Exchange: per-spin short-range LDA exchange (erfc attenuation factor
# F(a), a = omega/(2 kF_sigma), kF_sigma = (6 pi^2 n_sigma)^(1/3))
# times a power series g(u) = sum_i c_i u^i, u = gamma s^2/(1+gamma s^2),
# s^2 = sigma_ss / n_sigma^(8/3).
# Correlation: Stoll same/opposite-spin partition of PW92, each times its
# own power series in the corresponding u variable.
# ---------------------------------------------------------------------------

def _b97_u(s2, gamma):
    gs = gamma * s2
    return gs / (1.0 + gs)


def _b97_series(u, coeffs):
    acc = 0.0
    for c in reversed(coeffs):
        acc = acc * u + c
    return acc


def wb97_xc(rho_a, rho_b, sigma_aa, sigma_ab, sigma_bb,
            omega, cx, css, cos_):
    """omega-B97-family semilocal part: SR-GGA x + B97 c (full range).

    cx/css/cos_ are the power-series coefficient tuples for SR exchange,
    same-spin and opposite-spin correlation."""
    gam_x, gam_ss, gam_os = 0.004, 0.2, 0.006
    e = 0.0
    s2s = []
    for r, s in ((rho_a, sigma_aa), (rho_b, sigma_bb)):
        r_ = jnp.maximum(r, _TINY)
        s_ = jnp.maximum(s, 0.0)
        s2 = s_ / r_ ** (8.0 / 3.0)
        s2s.append(s2)
        # SR-LDA exchange for this spin: erfc-attenuated Slater
        e_lda = -1.5 * (3.0 / (4.0 * jnp.pi)) ** (1.0 / 3.0) * r_ ** (4.0 / 3.0)
        kf = (6.0 * jnp.pi ** 2 * r_) ** (1.0 / 3.0)
        Fa = _sr_attenuation(omega / (2.0 * kf))
        gx = _b97_series(_b97_u(s2, gam_x), cx)
        e = e + e_lda * Fa * gx
    # Stoll partition of PW92 correlation
    z = jnp.zeros_like(rho_a) + _TINY
    ec_ab = (rho_a + rho_b) * pw92_eps(rho_a, rho_b)
    ec_aa = rho_a * pw92_eps(rho_a, z)
    ec_bb = rho_b * pw92_eps(z, rho_b)
    g_ss_a = _b97_series(_b97_u(s2s[0], gam_ss), css)
    g_ss_b = _b97_series(_b97_u(s2s[1], gam_ss), css)
    u_os = _b97_u(0.5 * (s2s[0] + s2s[1]), gam_os)
    g_os = _b97_series(u_os, cos_)
    e = e + ec_aa * g_ss_a + ec_bb * g_ss_b + (ec_ab - ec_aa - ec_bb) * g_os
    return e


# published parameter sets: name -> (omega, SR_HF, LR_HF, cx, css, cos, nlc)
WB97_PARAMS = {
    # Mardirossian & Head-Gordon PCCP 16, 9904 (2014), Table 3
    'WB97X_V': (0.3, 0.167, 1.0,
                (0.833, 0.603),
                (0.556, -0.257),
                (1.219, -1.850),
                ('VV10', 6.0, 0.01)),
    # Chai & Head-Gordon JCP 128, 084106 (2008), Table 1
    'WB97': (0.4, 0.0, 1.0,
             (1.0, 1.13116, -2.74915, 12.09000, -5.71642),
             (1.0, -2.55352, 11.8926, -26.9452, 17.0927),
             (1.0, 3.99051, -17.0066, 1.07292, 8.88211),
             None),
    'WB97X': (0.3, 0.157706, 1.0,
              (0.842294, 0.726069, 1.04451, -5.70635, 13.2794),
              (1.0, -4.33879, 18.2308, -31.7430, 17.2901),
              (1.0, 2.37031, -11.3995, 6.58405, -3.78132),
              None),
}


# ---------------------------------------------------------------------------
# PZ81 LDA correlation + P86 gradient correction (BP86/B3P86)
# ---------------------------------------------------------------------------

def _pz81_eps_channel(rs, lng, g, b1, b2, A, B, C, D):
    """Perdew-Zunger 1981 (PRB 23, 5048) eps_c for one spin channel.

    rs < 1: A ln rs + B + C rs ln rs + D rs;  rs >= 1: g/(1+b1 sqrt(rs)+b2 rs).
    Both branches are evaluated (jnp.where) -- safe for rs > 0.
    """
    lo = A * lng + B + C * rs * lng + D * rs
    hi = g / (1.0 + b1 * jnp.sqrt(rs) + b2 * rs)
    return jnp.where(rs < 1.0, lo, hi)


def pz81_eps(rho_a, rho_b):
    """PZ81 correlation energy per particle (the LDA inside P86)."""
    rho = jnp.maximum(rho_a + rho_b, _TINY)
    zeta = jnp.clip((rho_a - rho_b) / rho, -1 + 1e-15, 1 - 1e-15)
    rs = _rs(rho)
    lng = jnp.log(rs)
    ep = _pz81_eps_channel(rs, lng, -0.1423, 1.0529, 0.3334,
                           0.0311, -0.048, 0.0020, -0.0116)
    ef = _pz81_eps_channel(rs, lng, -0.0843, 1.3981, 0.2611,
                           0.01555, -0.0269, 0.0007, -0.0048)
    return ep + (ef - ep) * _f_zeta(zeta)


def pz81_c(rho_a, rho_b):
    return (rho_a + rho_b) * pz81_eps(rho_a, rho_b)


def p86_c(rho_a, rho_b, sigma):
    """Perdew 1986 correlation (PRB 33, 8822): PZ81 local part plus the
    gradient correction e^{-Phi} C(rho) |grad rho|^2 / (d(zeta) rho^{4/3}).
    sigma = |grad rho_total|^2. Reference analog: libxc gga_c_p86 used by
    'BP86'/'B3P86' (pyscf/dft/libxc.py XC_CODES 'BP86': 'B88,P86')."""
    rho = jnp.maximum(rho_a + rho_b, _TINY)
    zeta = jnp.clip((rho_a - rho_b) / rho, -1 + 1e-15, 1 - 1e-15)
    rs = _rs(rho)
    # C(rs) with C(0) = 0.004235, C(inf) = 0.001667 (paper eq. 6)
    beta = 7.389e-6
    cn = 0.001667 + ((0.002568 + 0.023266 * rs + beta * rs * rs)
                     / (1.0 + 8.723 * rs + 0.472 * rs * rs
                        + 1.0e4 * beta * rs ** 3))
    c_hd = 0.001667 + 0.002568        # high-density limit C(0)
    grad = jnp.sqrt(jnp.maximum(sigma, _TINY))
    phi = 1.745 * 0.11 * (c_hd / cn) * grad / rho ** (7.0 / 6.0)
    d = 2.0 ** (1.0 / 3.0) * jnp.sqrt(
        ((1.0 + zeta) / 2.0) ** (5.0 / 3.0)
        + ((1.0 - zeta) / 2.0) ** (5.0 / 3.0))
    e_grad = jnp.exp(-jnp.minimum(phi, 200.0)) * cn * jnp.maximum(
        sigma, 0.0) / (d * rho ** (4.0 / 3.0))
    return pz81_c(rho_a, rho_b) + e_grad


# published B97-family full-range parameter sets (omega = 0):
# name -> (hyb, cx, css, cos)
B97_PARAMS = {
    # Becke JCP 107, 8554 (1997), Table I
    'B97': (0.1943,
            (0.8094, 0.5073, 0.7481),
            (0.1737, 2.3487, -2.4868),
            (0.9454, 0.7471, -4.5961)),
    # Hamprecht, Cohen, Tozer, Handy JCP 109, 6264 (1998), Table II
    'B97_1': (0.21,
              (0.789518, 0.573805, 0.660975),
              (0.0820011, 2.71681, -2.87103),
              (0.955689, 0.788552, -5.47869)),
    # Wilson, Bradley, Tozer JCP 115, 9233 (2001), Table 1
    'B97_2': (0.21,
              (0.827642, 0.04784, 1.76125),
              (0.585808, -0.691682, 0.394796),
              (0.999849, 1.40626, -7.44060)),
    # Grimme J. Comput. Chem. 27, 1787 (2006) (use with DFT-D2)
    'B97_D': (0.0,
              (1.08662, -0.52127, 3.25429),
              (0.22340, -1.56208, 1.94293),
              (0.69041, 6.30270, -14.9712)),
}
