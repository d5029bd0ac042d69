"""Import-time shim for running the reference tool in compat mode on hosts
without torchaudio.  Any actual use raises, steering the reference onto its
own fallback ladder (raw-PCM load, spectral features, compat tokens)."""
class _Unavailable:
    def __init__(self, name): self._name = name
    def __call__(self, *a, **k):
        raise RuntimeError(f"{self._name} unavailable (shim)")
    def __getattr__(self, item):
        return _Unavailable(f"{self._name}.{item}")
def __getattr__(name):
    if name == "transforms":
        from . import transforms
        return transforms
    return _Unavailable(f"torchaudio.{name}")
