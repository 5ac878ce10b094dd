"""r2SCAN + wB97X-V functional validation.

No libxc oracle exists in this environment, so r2SCAN is validated
against the exact constraints it was *constructed* to satisfy (Furness
et al., JPCL 11, 8208 (2020)): the uniform-electron-gas limit, the
2nd-order gradient expansion for exchange (pointwise, by construction of
the h1x damping term), and the restored 2nd-order gradient expansion for
correlation at the integrated level (the Delta-y term; without it the
test ratio converges to ~1.105, so the check has discriminating power).
"""
import numpy as np
import pytest

import pyscf_tpu as pt
from pyscf_tpu.dft import xc_funcs as F
from pyscf_tpu.dft import xc as xc_mod

import jax.numpy as jnp


def test_r2scan_ueg_limits():
    n0 = 0.3
    tau_u = 0.3 * (3 * np.pi ** 2 * n0) ** (2 / 3) * n0
    ex = F.r2scan_x(n0 / 2, n0 / 2, 1e-30, 1e-30, tau_u / 2, tau_u / 2)
    ex_lda = F.lda_x(n0 / 2, n0 / 2)
    assert abs(float(ex / ex_lda) - 1.0) < 1e-8
    ec = F.r2scan_c(n0 / 2, n0 / 2, 0., 0., 0., tau_u / 2, tau_u / 2)
    ec_pw = n0 * F.pw92_eps(n0 / 2, n0 / 2)
    assert abs(float(ec - ec_pw)) < 1e-8


def test_r2scan_x_ge2_slope():
    """(Fx-1)/p -> mu_AK = 10/81 along the slowly-varying relation
    abar = 1 - C_eta p."""
    n = 0.3
    ceta = 20 / 27 + 0.001 * 5 / 3
    for pval in (1e-4, 1e-5):
        kf2 = (3 * np.pi ** 2 * n) ** (2 / 3)
        sig = pval * 4 * kf2 * n * n
        tw, tu = sig / (8 * n), 0.3 * kf2 * n
        tau = (1 - ceta * pval) * (tu + 0.001 * tw) + tw
        fx = float(F._r2scan_fx_spin(n, sig, tau))
        assert abs((fx - 1) / pval - 10 / 81) < 1e-3


def test_r2scan_c_ge2_integrated():
    """Correlation gradient correction integrates to the exact GE2
    coefficient beta(rs) phi^3 t^2 as q -> 0 (Delta-y restores it)."""
    n0 = 0.3

    def ratio(q, eps_m=0.05):
        z = np.linspace(0, 2 * np.pi / q, 2001)
        n = n0 * (1 + eps_m * np.cos(q * z))
        dn = -n0 * eps_m * q * np.sin(q * z)
        d2n = -n0 * eps_m * q * q * np.cos(q * z)
        sig = dn * dn
        tauU = 0.3 * (3 * np.pi ** 2 * n) ** (2 / 3) * n
        tau = tauU + sig / (72 * n) + d2n / 6       # GE2 kinetic density
        ec = np.asarray(F.r2scan_c(
            jnp.asarray(n / 2), jnp.asarray(n / 2), jnp.asarray(sig / 4),
            jnp.asarray(sig / 4), jnp.asarray(sig / 4),
            jnp.asarray(tau / 2), jnp.asarray(tau / 2)))
        ec_lsda = n * np.asarray(F.pw92_eps(jnp.asarray(n / 2),
                                            jnp.asarray(n / 2)))
        rs = (3 / (4 * np.pi * n)) ** (1 / 3)
        kf = (3 * np.pi ** 2 * n) ** (1 / 3)
        t2 = (3 * np.pi ** 2 / 16) ** (2 / 3) * sig / (2 * kf * n) ** 2 / rs
        beta = 0.066725 * (1 + 0.1 * rs) / (1 + 0.1778 * rs)
        num = np.trapz(ec - ec_lsda, z)
        den = np.trapz(n * beta * t2, z)
        return num / den

    r1, r2 = ratio(0.3), ratio(0.15)
    assert abs(r1 - 1) < 0.02
    assert abs(r2 - 1) < 0.005            # O(q^2) convergence to exactly 1


def test_r2scan_equals_scan_single_orbital():
    """For one-orbital densities (abar = 0), r2SCAN == SCAN by
    construction (both reduce to h0x*gx and eps_c0)."""
    mol = pt.M(atom='He 0 0 0', basis='cc-pvdz', verbose=0)
    e1 = pt.dft.RKS(mol, xc='scan').kernel()
    e2 = pt.dft.RKS(mol, xc='r2scan').kernel()
    assert abs(e1 - e2) < 1e-6


def test_mgga_f32_prestage_finite():
    """The fused mixed-precision driver must converge mGGAs (regression:
    subnormal-flush inf in the f32 reduced-gradient backward pass)."""
    mol = pt.M(atom='He 0 0 0', basis='cc-pvdz', verbose=0)
    mf = pt.dft.RKS(mol, xc='r2scan')
    e = mf.kernel()
    assert mf.converged and np.isfinite(e)
    assert -2.92 < e < -2.85


def test_wb97xv_parse():
    fn = xc_mod.parse_xc('wb97x-v')
    assert fn.rsh == (0.3, 1.0, 0.167)
    assert fn.nlc == ('VV10', 6.0, 0.01)
    # SR attenuation limits
    assert abs(float(F._sr_attenuation(jnp.asarray(1e-8))) - 1.0) < 1e-6
    assert float(F._sr_attenuation(jnp.asarray(40.0))) < 1e-3


@pytest.mark.slow
def test_wb97xv_he():
    mol = pt.M(atom='He 0 0 0', basis='cc-pvdz', verbose=0)
    mf = pt.dft.RKS(mol, xc='wb97x-v')
    e = mf.kernel()
    assert mf.converged
    assert mf.nlc == 'VV10' and mf.nlc_b == 6.0
    # self-golden (locked at first implementation)
    assert abs(e - (-2.87392355)) < 1e-6


def test_xc_assignment_resolves_nlc():
    """`mf.xc = 'wb97x-v'` after construction must switch VV10 on, and
    assigning a VV10-free functional must switch it back off (the
    reference resolves NLC from the xc string at evaluation time)."""
    import pyscf_tpu as pt
    mol = pt.M(atom='He 0 0 0', basis='sto-3g', verbose=0)
    mf = pt.dft.RKS(mol)            # lda,vwn: no NLC
    assert not getattr(mf, 'nlc', '')
    mf.xc = 'wb97x-v'
    assert getattr(mf, 'nlc', '')
    assert mf.nlc_b > 0 and mf.nlc_C > 0
    mf.xc = 'pbe,pbe'
    assert not getattr(mf, 'nlc', '')
    mf2 = pt.dft.RKS(mol, xc='wb97x-v')
    assert getattr(mf2, 'nlc', '')


# ---------------------------------------------------------------------------
# PZ81 / P86 (BP86, B3P86) and the full-range B97 power-series family
# ---------------------------------------------------------------------------

def test_pz81_vs_pw92():
    """PZ81 and PW92 both parametrize the Ceperley-Alder UEG data; their
    eps_c must agree to ~1e-3 Ha over the metallic range (a transcription
    error in any PZ81 constant breaks this by orders of magnitude)."""
    for rs in (0.5, 1.0, 2.0, 5.0, 10.0, 20.0):
        n = 3.0 / (4.0 * np.pi * rs ** 3)
        e_pz = float(F.pz81_eps(n / 2, n / 2))
        e_pw = float(F.pw92_eps(n / 2, n / 2))
        assert abs(e_pz - e_pw) < 1.5e-3
    # spin-polarized channel too
    n = 3.0 / (4.0 * np.pi * 2.0 ** 3)
    e_pz = float(F.pz81_eps(n, 1e-30))
    e_pw = float(F.pw92_eps(n, 1e-30))
    assert abs(e_pz - e_pw) < 1.5e-3


def test_pz81_continuity_at_rs1():
    """The PZ81 piecewise form is continuous at rs=1 by construction."""
    n_lo = 3.0 / (4.0 * np.pi * 0.999 ** 3)
    n_hi = 3.0 / (4.0 * np.pi * 1.001 ** 3)
    jump = abs(float(F.pz81_eps(n_lo / 2, n_lo / 2))
               - float(F.pz81_eps(n_hi / 2, n_hi / 2)))
    assert jump < 5e-5


def test_p86_limits():
    """sigma -> 0 reduces P86 to PZ81; the local-ratio C(rs) hits its
    published endpoints C(0)=0.004235, C(inf)=0.001667 (Perdew PRB 33,
    8822, eq. 6)."""
    n = 0.3
    assert abs(float(F.p86_c(n / 2, n / 2, 0.0) - F.pz81_c(n / 2, n / 2))) \
        < 1e-14
    # gradient correction at rs->0: e_grad -> C(0) sigma / rho^{4/3}
    n_hd = 3.0 / (4.0 * np.pi * 1e-4 ** 3)
    sig = (1e-3 * n_hd ** (7.0 / 6.0)) ** 2   # keep Phi tiny
    e_grad = float(F.p86_c(n_hd / 2, n_hd / 2, sig) - F.pz81_c(n_hd / 2,
                                                               n_hd / 2))
    assert abs(e_grad / (sig / n_hd ** (4.0 / 3.0)) - 0.004235) < 5e-4
    # low-density limit of C: rs = 1e4
    n_ld = 3.0 / (4.0 * np.pi * 1e4 ** 3)
    sig = (1e-3 * n_ld ** (7.0 / 6.0)) ** 2
    e_grad = float(F.p86_c(n_ld / 2, n_ld / 2, sig) - F.pz81_c(n_ld / 2,
                                                               n_ld / 2))
    assert abs(e_grad / (sig / n_ld ** (4.0 / 3.0)) - 0.001667) < 5e-4


def test_b97_family_ueg():
    """At zero density gradient every B97-family member reduces to
    c_x0 * LDA_x + Stoll-partitioned PW92 weighted by c_ss0/c_os0."""
    n = 0.3
    for name, (hyb, cx, css, cos_) in F.B97_PARAMS.items():
        xcf = xc_mod.parse_xc(name)
        assert xcf.hyb == hyb and xcf.omega == 0.0
        e = float(xcf.exc_density(n / 2, n / 2, 1e-30, 1e-30, 1e-30))
        ex = cx[0] * float(F.lda_x(n / 2, n / 2))
        ec_ab = n * float(F.pw92_eps(n / 2, n / 2))
        ec_ss = n / 2 * float(F.pw92_eps(n / 2, 1e-30))
        expect = ex + 2 * css[0] * ec_ss + cos_[0] * (ec_ab - 2 * ec_ss)
        assert abs(e - expect) < 1e-7


def test_bp86_b3p86_parse_and_he():
    fn = xc_mod.parse_xc('BP86')
    assert fn.hyb == 0.0 and fn.is_gga and not fn.is_mgga
    fn3 = xc_mod.parse_xc('B3P86')
    assert fn3.hyb == 0.2
    mol = pt.M(atom='He 0 0 0', basis='sto-3g', verbose=0)
    for xc, lo, hi in (('bp86', -2.87, -2.79), ('b3p86', -2.87, -2.79),
                       ('b97-1', -2.87, -2.79), ('b97d', -2.87, -2.79)):
        mf = pt.dft.RKS(mol, xc=xc)
        e = mf.kernel()
        assert mf.converged and lo < e < hi, (xc, e)


def test_double_hybrid_b2plyp():
    """RKS(xc='b2plyp') must equal the hand-composed definition exactly:
    SCF with 0.53 HF + 0.47 B88 x / 0.73 LYP c, plus 0.27 * MP2 on the
    converged KS orbitals (Grimme JCP 124, 034108 (2006))."""
    from pyscf_tpu import mp
    fn = xc_mod.parse_xc('B2PLYP')
    assert fn.hyb == 0.53 and fn.pt2 == (0.27, 0.27)
    mol = pt.M(atom='O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587',
               basis='sto-3g', verbose=0)
    mf = pt.dft.RKS(mol, xc='b2plyp').density_fit()
    e = mf.kernel()
    mf2 = pt.dft.RKS(mol, xc='0.53*HF + 0.47*B88, 0.73*LYP').density_fit()
    e2 = mf2.kernel()
    pt2 = mp.MP2(mf2)
    pt2.kernel()
    assert abs(e - (e2 + 0.27 * float(pt2.energy_scs(1.0, 1.0)))) < 1e-10
    assert abs(mf.e_scf - e2) < 1e-10


def test_double_hybrid_dsd_scs():
    """DSD-BLYP splits the PT2 tail into os/ss components (0.46/0.37)."""
    fn = xc_mod.parse_xc('DSD-BLYP')
    assert fn.hyb == 0.69 and fn.pt2 == (0.46, 0.37)
