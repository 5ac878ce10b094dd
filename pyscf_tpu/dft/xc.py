"""XC functional composition and evaluation (analog of reference
pyscf/dft/libxc.py parse_xc/eval_xc, with derivatives by jax.grad).

A functional is a list of weighted components plus a hybrid HF-exchange
fraction. Energy density e(rho_a, rho_b, sigma_aa, sigma_ab, sigma_bb)
is pure jnp; vxc/fxc come from autodiff in numint.
"""
from functools import lru_cache

from . import xc_funcs as F

# component kinds
LDA, GGA, MGGA = 0, 1, 2


def _x_slater(ra, rb, saa, sab, sbb):
    return F.lda_x(ra, rb)


def _c_vwn5(ra, rb, saa, sab, sbb):
    return F.vwn5_c(ra, rb)


def _c_vwn3(ra, rb, saa, sab, sbb):
    return F.vwn3_c(ra, rb)


def _c_pw92(ra, rb, saa, sab, sbb):
    return F.pw92_c(ra, rb)


def _c_pz81(ra, rb, saa, sab, sbb):
    return F.pz81_c(ra, rb)


def _c_p86(ra, rb, saa, sab, sbb):
    return F.p86_c(ra, rb, saa + 2 * sab + sbb)


def _x_b88(ra, rb, saa, sab, sbb):
    return F.b88_x(ra, rb, saa, sbb)


def _x_pbe(ra, rb, saa, sab, sbb):
    return F.pbe_x(ra, rb, saa, sbb)


def _c_pbe(ra, rb, saa, sab, sbb):
    return F.pbe_c(ra, rb, saa + 2 * sab + sbb)


def _c_lyp(ra, rb, saa, sab, sbb):
    return F.lyp_c(ra, rb, saa, sab, sbb)


def _x_pw91(ra, rb, saa, sab, sbb):
    return F.pw91_x(ra, rb, saa, sbb)


def _c_pw91(ra, rb, saa, sab, sbb):
    return F.pw91_c(ra, rb, saa + 2 * sab + sbb)


def _x_cam_b88(omega, alpha, beta):
    def fn(ra, rb, saa, sab, sbb):
        return F.cam_b88_x(ra, rb, saa, sbb, omega, alpha, beta)
    return fn


def _x_tpss(ra, rb, saa, sab, sbb, ta, tb):
    return F.tpss_x(ra, rb, saa, sbb, ta, tb)


def _c_tpss(ra, rb, saa, sab, sbb, ta, tb):
    return F.tpss_c(ra, rb, saa, sab, sbb, ta, tb)


def _x_scan(ra, rb, saa, sab, sbb, ta, tb):
    return F.scan_x(ra, rb, saa, sbb, ta, tb)


def _c_scan(ra, rb, saa, sab, sbb, ta, tb):
    return F.scan_c(ra, rb, saa, sab, sbb, ta, tb)


def _x_r2scan(ra, rb, saa, sab, sbb, ta, tb):
    return F.r2scan_x(ra, rb, saa, sbb, ta, tb)


def _c_r2scan(ra, rb, saa, sab, sbb, ta, tb):
    return F.r2scan_c(ra, rb, saa, sab, sbb, ta, tb)


# name -> (family, fn)
FUNCTIONALS = {
    'SLATER': (LDA, _x_slater),
    'LDA': (LDA, _x_slater),
    'XALPHA': (LDA, _x_slater),
    'VWN': (LDA, _c_vwn5),
    'VWN5': (LDA, _c_vwn5),
    'VWN3': (LDA, _c_vwn3),
    'VWN_RPA': (LDA, _c_vwn3),
    'PW92': (LDA, _c_pw92),
    'PW': (LDA, _c_pw92),
    'PW_LDA': (LDA, _c_pw92),
    'PZ81': (LDA, _c_pz81),
    'PZ': (LDA, _c_pz81),
    'P86': (GGA, _c_p86),
    'B88': (GGA, _x_b88),
    'B': (GGA, _x_b88),
    'PBE_X': (GGA, _x_pbe),
    'PBE_C': (GGA, _c_pbe),
    'LYP': (GGA, _c_lyp),
    'PW91_X': (GGA, _x_pw91),
    'PW91_C': (GGA, _c_pw91),
    'TPSS_X': (MGGA, _x_tpss),
    'TPSS_C': (MGGA, _c_tpss),
    'SCAN_X': (MGGA, _x_scan),
    'SCAN_C': (MGGA, _c_scan),
    'R2SCAN_X': (MGGA, _x_r2scan),
    'R2SCAN_C': (MGGA, _c_r2scan),
}

# compound aliases: (hyb, [(coeff, xname)], [(coeff, cname)])
COMPOUND = {
    'LDA,VWN': (0.0, [(1.0, 'SLATER')], [(1.0, 'VWN5')]),
    'LDA': (0.0, [(1.0, 'SLATER')], []),
    'SVWN': (0.0, [(1.0, 'SLATER')], [(1.0, 'VWN5')]),
    'PBE': (0.0, [(1.0, 'PBE_X')], [(1.0, 'PBE_C')]),
    'PBE0': (0.25, [(0.75, 'PBE_X')], [(1.0, 'PBE_C')]),
    'PBEH': (0.25, [(0.75, 'PBE_X')], [(1.0, 'PBE_C')]),
    'BLYP': (0.0, [(1.0, 'B88')], [(1.0, 'LYP')]),
    # reference dft/libxc.py XC_CODES 'BP86': 'B88,P86'
    'BP86': (0.0, [(1.0, 'B88')], [(1.0, 'P86')]),
    # reference 'B3P86' (libxc 403, the Gaussian form, VWN-RPA) and the
    # explicit 'B3P86V5' = .2*HF+.08*SLATER+.72*B88, .81*P86+.19*VWN
    'B3P86': (0.2, [(0.08, 'SLATER'), (0.72, 'B88')],
              [(0.81, 'P86'), (0.19, 'VWN_RPA')]),
    'B3P86G': (0.2, [(0.08, 'SLATER'), (0.72, 'B88')],
               [(0.81, 'P86'), (0.19, 'VWN_RPA')]),
    'B3P86V5': (0.2, [(0.08, 'SLATER'), (0.72, 'B88')],
                [(0.81, 'P86'), (0.19, 'VWN5')]),
    'B3LYP': (0.2, [(0.08, 'SLATER'), (0.72, 'B88')],
              [(0.81, 'LYP'), (0.19, 'VWN_RPA')]),
    'B3LYP5': (0.2, [(0.08, 'SLATER'), (0.72, 'B88')],
               [(0.81, 'LYP'), (0.19, 'VWN5')]),
    'B3LYPG': (0.2, [(0.08, 'SLATER'), (0.72, 'B88')],
               [(0.81, 'LYP'), (0.19, 'VWN_RPA')]),
    'PW91': (0.0, [(1.0, 'PW91_X')], [(1.0, 'PW91_C')]),
    'TPSS': (0.0, [(1.0, 'TPSS_X')], [(1.0, 'TPSS_C')]),
    'SCAN': (0.0, [(1.0, 'SCAN_X')], [(1.0, 'SCAN_C')]),
    'SCAN0': (0.25, [(0.75, 'SCAN_X')], [(1.0, 'SCAN_C')]),
    'R2SCAN': (0.0, [(1.0, 'R2SCAN_X')], [(1.0, 'R2SCAN_C')]),
    'R2SCAN0': (0.25, [(0.75, 'R2SCAN_X')], [(1.0, 'R2SCAN_C')]),
    'PW91,PW91': (0.0, [(1.0, 'PW91_X')], [(1.0, 'PW91_C')]),
    'XLYP': (0.0, [(-0.069, 'SLATER'), (0.722, 'B88'), (0.347, 'PW91_X')],
             [(1.0, 'LYP')]),
    'HF': (1.0, [], []),
}

# double hybrids: name -> (hyb, x_terms, c_terms, (c_os, c_ss) PT2)
# B2PLYP: Grimme JCP 124, 034108 (2006); B2GP-PLYP: Karton et al. JPCA
# 112, 12868 (2008); DSD-BLYP: Kozuch & Martin JPCC 114, 20801 (2010)
# (spin-component-scaled PT2, parameters without the D3 correction).
DH_COMPOUND = {
    'B2PLYP': (0.53, [(0.47, 'B88')], [(0.73, 'LYP')], (0.27, 0.27)),
    'B2GPPLYP': (0.65, [(0.35, 'B88')], [(0.64, 'LYP')], (0.36, 0.36)),
    'DSD_BLYP': (0.69, [(0.31, 'B88')], [(0.54, 'LYP')], (0.46, 0.37)),
    'DSDBLYP': (0.69, [(0.31, 'B88')], [(0.54, 'LYP')], (0.46, 0.37)),
}

# range-separated compounds: name -> (omega, alpha_SR_HF, beta_LR_increment,
#                                     x_terms_builder, c_terms)
# K_eff = alpha*K_full(SR part handled as alpha) ... in reference terms:
#   rsh_coeff = (omega, alpha + beta [LR total], alpha [SR/"hyb"])
RSH_COMPOUND = {
    'CAMB3LYP': (0.33, 0.19, 0.46,
                 lambda w, a, b: [(1.0, GGA, _x_cam_b88(w, a, b))],
                 [(0.81, 'LYP'), (0.19, 'VWN5')]),
    'CAM_B3LYP': (0.33, 0.19, 0.46,
                  lambda w, a, b: [(1.0, GGA, _x_cam_b88(w, a, b))],
                  [(0.81, 'LYP'), (0.19, 'VWN5')]),
}


def _wb97_term(omega, cx, css, cos_):
    def fn(ra, rb, saa, sab, sbb):
        return F.wb97_xc(ra, rb, saa, sab, sbb, omega, cx, css, cos_)
    return fn


class XCFunctional:
    def __init__(self, hyb, terms, rsh=(0.0, 0.0, 0.0), nlc=None,
                 pt2=None):
        self.hyb = hyb               # HF exchange fraction (SR part for RSH)
        self.terms = terms           # [(coeff, family, fn)]
        self.family = max((f for _, f, _ in terms), default=LDA)
        # range separation (omega, alpha_LR_total, hyb_SR); reference
        # convention (dft/libxc.py rsh_coeff): K = hyb*K + (alpha-hyb)*K_LR
        self.rsh = rsh
        self.omega = rsh[0]
        # built-in nonlocal correlation: ('VV10', b, C) or None
        self.nlc = nlc
        # double-hybrid PT2 tail: (c_os, c_ss) MP2 coefficients evaluated
        # on the converged KS orbitals (reference users compose this by
        # hand: libxc semilocal part + scaled mp.MP2; here it is native)
        self.pt2 = pt2

    def exc_density(self, ra, rb, saa, sab, sbb, ta=None, tb=None):
        e = 0.0
        for c, fam, fn in self.terms:
            if fam == MGGA:
                e = e + c * fn(ra, rb, saa, sab, sbb, ta, tb)
            else:
                e = e + c * fn(ra, rb, saa, sab, sbb)
        return e

    @property
    def is_hybrid(self):
        return self.hyb != 0.0

    @property
    def is_gga(self):
        return self.family >= GGA

    @property
    def is_mgga(self):
        return self.family >= MGGA

    @property
    def is_lda(self):
        return self.family == LDA


def _parse_terms(spec, default_kind):
    """Parse 'A + 0.5*B' style sums into [(coeff, NAME)]."""
    out = []
    for tok in spec.replace('-', '_MINUS_').split('+'):
        tok = tok.strip().replace('_MINUS_', '-')
        if not tok:
            continue
        coeff = 1.0
        name = tok
        if '*' in tok:
            c, name = tok.split('*')
            coeff = float(c)
        out.append((coeff, name.strip().upper()))
    return out


@lru_cache(maxsize=None)
def parse_xc(xc_code):
    """Parse an XC specification string into an XCFunctional."""
    if not isinstance(xc_code, str):
        raise TypeError(xc_code)
    code = xc_code.upper().replace(' ', '')
    cname = code.replace('-', '_')      # compound-name lookups only
    if cname in F.WB97_PARAMS:
        omega, sr_hf, lr_hf, cx, css, cos_, nlc = F.WB97_PARAMS[cname]
        terms = [(1.0, GGA, _wb97_term(omega, cx, css, cos_))]
        return XCFunctional(sr_hf, terms, rsh=(omega, lr_hf, sr_hf),
                            nlc=nlc)
    if cname == 'B97D':
        cname = 'B97_D'
    if cname in F.B97_PARAMS:
        # full-range B97 power-series hybrids: same machinery with omega=0
        # (the SR attenuation factor F(a->0)=1). Reference analog: libxc
        # HYB_GGA_XC_B97* via pyscf/dft/libxc.py XC_ALIAS 'B97-1' etc.
        hyb, cx, css, cos_ = F.B97_PARAMS[cname]
        terms = [(1.0, GGA, _wb97_term(0.0, cx, css, cos_))]
        return XCFunctional(hyb, terms)
    if cname in RSH_COMPOUND:
        code = cname
    if code in RSH_COMPOUND:
        omega, a, b, xbuild, cs = RSH_COMPOUND[code]
        terms = list(xbuild(omega, a, b))
        for c, n in cs:
            fam, fn = FUNCTIONALS[n]
            terms.append((c, fam, fn))
        return XCFunctional(a, terms, rsh=(omega, a + b, a))
    if cname in DH_COMPOUND:
        hyb, xs, cs, pt2 = DH_COMPOUND[cname]
        terms = []
        for c, n in xs + cs:
            fam, fn = FUNCTIONALS[n]
            terms.append((c, fam, fn))
        return XCFunctional(hyb, terms, pt2=pt2)
    if code in COMPOUND and COMPOUND[code] is not None:
        hyb, xs, cs = COMPOUND[code]
        terms = []
        for c, n in xs + cs:
            fam, fn = FUNCTIONALS[n]
            terms.append((c, fam, fn))
        return XCFunctional(hyb, terms)
    hyb = 0.0
    terms = []
    if ',' in code:
        xpart, cpart = code.split(',', 1)
        parts = [(xpart, 'X'), (cpart, 'C')]
    else:
        parts = [(code, 'X')]
    for spec, kind in parts:
        for coeff, name in _parse_terms(spec, kind):
            if name in ('HF',):
                hyb += coeff
                continue
            key = name
            if key not in FUNCTIONALS and f'{key}_{kind}' in FUNCTIONALS:
                key = f'{key}_{kind}'
            if key not in FUNCTIONALS:
                raise KeyError(f'Unknown XC functional component {name!r} '
                               f'in {xc_code!r}')
            fam, fn = FUNCTIONALS[key]
            terms.append((coeff, fam, fn))
    return XCFunctional(hyb, terms)


def hybrid_coeff(xc_code):
    return parse_xc(xc_code).hyb


def rsh_coeff(xc_code):
    """(omega, alpha_LR, hyb_SR) — reference dft/libxc.py:436 convention."""
    return parse_xc(xc_code).rsh


def is_gga(xc_code):
    return parse_xc(xc_code).is_gga


def is_lda(xc_code):
    return parse_xc(xc_code).is_lda
