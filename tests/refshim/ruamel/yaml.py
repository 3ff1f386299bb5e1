"""ruamel.yaml shim backed by pyyaml — enough for the reference's
`yaml.YAML(typ='safe').load(text)` call (crafter/constants.py:5-6)."""

import yaml as _pyyaml


class YAML:

  def __init__(self, typ='safe', pure=True):
    del typ, pure

  def load(self, stream):
    return _pyyaml.safe_load(stream)
