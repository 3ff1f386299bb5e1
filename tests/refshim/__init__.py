"""Test-only dependency shims that let the *actual reference package*
(/root/reference/crafter) import and run inside this sandbox, where its
`opensimplex` and `ruamel.yaml` dependencies are not installed.

Used by tests/test_reference_parity.py to run live behavioral-parity
comparisons between the reference engine and crafter_tpu.
"""

import pathlib
import sys

REFERENCE = pathlib.Path('/root/reference')


def install():
  """Register shim modules and put the reference repo on sys.path."""
  if not REFERENCE.exists():
    return False
  here = pathlib.Path(__file__).parent
  if str(here) not in sys.path:
    sys.path.insert(0, str(here))  # provides `opensimplex`, `ruamel`
  if str(REFERENCE) not in sys.path:
    sys.path.insert(0, str(REFERENCE))
  return True
