"""Version constants.

Single source of truth for version strings used in model IDs and stream
headers (mirrors the role of reference neural_audio_tokenizer.py:3-5).
"""

VERSION = "v0.1.0"
VERSION_TAG = f"nat-tpu {VERSION}"

# NDJSON stream format version this implementation emits.  Kept at "1.5" for
# wire compatibility with the reference `lam_audio_tokens` schema
# (reference neural_audio_tokenizer.py:2674, man/lam_audio_tokens.5).
FORMAT_VERSION = "1.5"
SCHEMA_NAME = "lam_audio_tokens"
