def __getattr__(name):
    def _fail(*a, **k):
        raise RuntimeError("soundfile unavailable (shim)")
    return _fail
