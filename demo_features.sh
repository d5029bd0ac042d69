#!/usr/bin/env bash
# nat-tpu feature demo (counterpart of the reference's demo_features.sh).
# Exercises logging levels, stdin magic detection, FS-delimited multi-file
# streaming, RLE mode, and metric export — all in compat mode so it runs
# anywhere without model weights.
set -euo pipefail
cd "$(dirname "$0")"

NAT=${NAT:-./nat}
WAV=tests/fixtures/test_simple.wav
WAV2=tests/fixtures/test_simple2.wav
python - <<'EOF'
import sys; sys.path.insert(0, '.')
import numpy as np
from pathlib import Path
from nat_tpu.io.audio import write_wav
Path('tests/fixtures').mkdir(parents=True, exist_ok=True)
sr = 22050
for name, freq, dur in (("test_simple.wav", 440, 1.0), ("test_simple2.wav", 220, 2.0)):
    p = Path('tests/fixtures') / name
    if not p.exists():
        t = np.arange(int(sr*dur))/sr
        write_wav(str(p), (np.sin(2*np.pi*freq*t)*0.5).astype(np.float32), sr)
EOF

echo "=== 1. Default mode: pure NDJSON on stdout, silent stderr"
$NAT --compat-fallback "$WAV" </dev/null | head -3

echo "=== 2. Verbose mode: diagnostics on stderr"
$NAT --compat-fallback -v "$WAV" </dev/null >/dev/null

echo "=== 3. Log levels"
for level in ERROR WARN INFO; do
  lines=$($NAT --compat-fallback --log-level $level "$WAV" </dev/null 2>&1 >/dev/null | wc -l)
  echo "  $level: $lines stderr lines"
done

echo "=== 4. Binary stdin (WAV magic detection)"
cat "$WAV" | $NAT --compat-fallback | head -1 | cut -c1-80

echo "=== 5. FS-delimited multi-file stdin"
cat "$WAV" <(printf '\x1c') "$WAV2" | $NAT --compat-fallback \
  | grep -c '"event":"header"' | xargs echo "  streams:"

echo "=== 6. RLE mode with keyframes"
$NAT --compat-fallback --rle --deterministic "$WAV" </dev/null | head -2 | cut -c1-100

echo "=== 7. Metrics export"
$NAT --compat-fallback --metrics /tmp/nat_demo_metrics.json "$WAV" </dev/null >/dev/null
python -c "import json; m=json.load(open('/tmp/nat_demo_metrics.json')); \
print('  compression:', round(m['compression_ratio'],1), 'entropy:', round(m['semantic_entropy'],2))"

echo "=== done"
