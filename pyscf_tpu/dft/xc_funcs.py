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
