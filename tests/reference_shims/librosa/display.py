def __getattr__(name):
    def _fail(*a, **k):
        raise RuntimeError("librosa.display unavailable (shim)")
    return _fail
