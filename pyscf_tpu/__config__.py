"""Layered runtime configuration (analog of reference pyscf/__config__.py).

Precedence: environment variables (PYSCF_TPU_<NAME>) > user config file
(PYSCF_TPU_CONFIG_FILE, exec'd like the reference's ~/.pyscf_conf.py) >
in-code defaults. Class attributes opt in via
    conv_tol = getattr(__config__, 'scf_hf_SCF_conv_tol', 1e-10)
"""
import os

# ---- defaults --------------------------------------------------------
MAX_MEMORY = int(os.environ.get('PYSCF_TPU_MAX_MEMORY', 16000))   # MB
TMPDIR = os.environ.get('PYSCF_TPU_TMPDIR',
                        os.environ.get('TMPDIR', '/tmp'))
VERBOSE = int(os.environ.get('PYSCF_TPU_VERBOSE', 4))

# integral generation device policy (see ops/device.py)
INT_DEVICE = os.environ.get('PYSCF_TPU_INT_DEVICE', 'cpu')

# user config file, exec'd into this namespace (reference __config__.py:22)
_conf = os.environ.get('PYSCF_TPU_CONFIG_FILE',
                       os.path.expanduser('~/.pyscf_tpu_conf.py'))
if os.path.isfile(_conf):
    with open(_conf) as _f:
        exec(_f.read())

# env-var overrides win over the config file: PYSCF_TPU_<name>
for _k, _v in list(os.environ.items()):
    if _k.startswith('PYSCF_TPU_CONF_'):
        _name = _k[len('PYSCF_TPU_CONF_'):]
        try:
            globals()[_name] = eval(_v)
        except Exception:
            globals()[_name] = _v
