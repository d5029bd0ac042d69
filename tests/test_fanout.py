"""Multi-host DCN file fan-out (parallel/fanout.py).

Simulates pod topologies with injected process_index/process_count and an
injected allgather, proving SURVEY §5.8's host-level work distribution:
disjoint per-host file coverage whose union is the full list, and metric
aggregates that merge across hosts exactly as a single host computing the
whole batch would.
"""

import json

import numpy as np
import pytest

from nat_tpu.parallel import fanout


class TestShardPaths:
    def test_disjoint_union(self):
        paths = [f"f{i}.wav" for i in range(11)]
        for pc in (1, 2, 3, 8, 11, 16):
            shards = [fanout.shard_paths(paths, pi, pc) for pi in range(pc)]
            flat = [p for s in shards for p in s]
            assert sorted(flat) == sorted(paths)
            assert len(set(flat)) == len(paths)

    def test_balanced(self):
        paths = [f"f{i}" for i in range(10)]
        sizes = [len(fanout.shard_paths(paths, pi, 3)) for pi in range(3)]
        assert max(sizes) - min(sizes) <= 1

    def test_single_host_identity(self):
        paths = ["a", "b"]
        assert fanout.shard_paths(paths, 0, 1) == paths

    def test_env_override(self, monkeypatch):
        monkeypatch.setenv("NAT_TPU_PROCESS_INDEX", "1")
        monkeypatch.setenv("NAT_TPU_PROCESS_COUNT", "2")
        assert fanout.shard_paths(["a", "b", "c"]) == ["b"]

    def test_bad_topology_rejected(self):
        with pytest.raises(ValueError):
            fanout.shard_paths(["a"], 2, 2)


class TestStatsMerge:
    def _dicts(self, values):
        return [{"m": v, "flag": True, "name": "x"} for v in values]

    def test_local_stats_numeric_only(self):
        s = fanout.local_stats(self._dicts([1.0, 3.0]))
        assert set(s) == {"m"}
        assert s["m"] == (2, 4.0, 1.0, 3.0)

    def test_merged_equals_single_host(self):
        """2-host split aggregates == one host over the whole batch."""
        all_values = [1.0, 5.0, 2.0, 8.0, 3.0]
        single = fanout.finalize_stats(
            fanout.local_stats(self._dicts(all_values)))
        host0 = fanout.local_stats(self._dicts(all_values[0::2]))
        host1 = fanout.local_stats(self._dicts(all_values[1::2]))
        merged = fanout.finalize_stats(fanout.merge_stats([host0, host1]))
        assert merged == pytest.approx(single)

    def test_gather_stats_with_injected_allgather(self, monkeypatch):
        """Full collective path, 2 simulated hosts (one empty)."""
        host0 = fanout.local_stats(self._dicts([2.0, 4.0]))
        host1: fanout.Stats = {}  # empty shard still participates

        def fake_allgather(local_matrix):
            # what a 2-host process_allgather would return
            mats = []
            for stats in (host0, host1):
                keys = ["m"]
                m = np.zeros((1, 4))
                n, s, lo, hi = stats.get("m", (0, 0.0, np.inf, -np.inf))
                m[0] = (n, s, lo if n else np.inf, hi if n else -np.inf)
                mats.append(m)
            return np.stack(mats)

        merged = fanout.gather_stats(host0, process_count=2,
                                     allgather=fake_allgather, keys=["m"])
        final = fanout.finalize_stats(merged)
        assert final["avg_m"] == 3.0
        assert final["min_m"] == 2.0
        assert final["max_m"] == 4.0


@pytest.mark.slow
class TestCliManualFanout:
    def test_two_process_batch_disjoint(self, cli, simple_wav, simple_wav2,
                                        tmp_path, monkeypatch):
        """Manual 2-process fan-out via env overrides: each CLI invocation
        processes its own stride of the file list; artifact sets are
        disjoint and cover all inputs."""
        out = tmp_path / "out"
        seen = []
        for pi in (0, 1):
            env = {"NAT_TPU_PROCESS_INDEX": str(pi),
                   "NAT_TPU_PROCESS_COUNT": "2"}
            rc, _, err = cli(["--compat-fallback", "--all-outputs",
                              "--output-dir", str(out),
                              "--metrics", str(tmp_path / f"m{pi}.json"),
                              str(simple_wav), str(simple_wav2)],
                             extra_env=env)
            assert rc == 0, err[-500:]
            produced = {p.name for p in out.glob("*_tokens.ndjson")}
            new = produced - set(seen)
            assert len(new) == 1, "each host must add exactly one file"
            seen.extend(new)
        assert sorted(seen) == ["test_simple2_tokens.ndjson",
                                "test_simple_tokens.ndjson"]
        # host 0 wrote the metrics aggregate; host 1 did not
        assert (tmp_path / "m0.json").exists()
        assert not (tmp_path / "m1.json").exists()
        agg = json.loads((tmp_path / "m0.json").read_text())
        assert "avg_compression_ratio" in agg
