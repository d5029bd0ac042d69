"""TokenFormatter wire parity (formats per reference 4216-4327)."""

import json

import numpy as np

from nat_tpu.stream.formatter import TokenFormatter


def make_codes():
    sem = [np.array([[1, 2]]), np.array([[3, 4]])]
    acc = [np.array([[5, 6]]), np.array([[7, 8]])]
    return sem, acc


class TestFormats:
    def test_hierarchical(self):
        sem, acc = make_codes()
        out = TokenFormatter().to_text_sequence(sem, acc, "hierarchical")
        assert out == ("[SEMANTIC] S0_1 S0_2 S1_3 S1_4 "
                       "[ACOUSTIC] A0_5 A0_6 A1_7 A1_8")

    def test_interleaved_alternates_flattened_sequences(self):
        sem, acc = make_codes()
        out = TokenFormatter().to_text_sequence(sem, acc, "interleaved")
        assert out == "S_1 A_5 S_2 A_6 S_3 A_7 S_4 A_8"

    def test_interleaved_unequal_lengths(self):
        sem = [np.array([[1, 2, 3]])]
        acc = [np.array([[9]])]
        out = TokenFormatter().to_text_sequence(sem, acc, "interleaved")
        assert out == "S_1 A_9 S_2 S_3"

    def test_structured_space_joined(self):
        sem, acc = make_codes()
        out = TokenFormatter().to_text_sequence(sem, acc, "structured")
        assert out == ("[T0][SEM:S0:1,S1:3][AC:A0:5,A1:7] "
                       "[T1][SEM:S0:2,S1:4][AC:A0:6,A1:8]")

    def test_unknown_format_raises(self):
        sem, acc = make_codes()
        try:
            TokenFormatter().to_text_sequence(sem, acc, "nope")
            assert False
        except ValueError:
            pass

    def test_json_schema(self):
        sem, acc = make_codes()
        data = json.loads(TokenFormatter().to_json(sem, acc,
                                                   metadata={"x": 1}))
        assert data["format_version"] == "1.5"
        assert data["tokenization_type"] == "neural_hybrid"
        assert data["semantic_tokens"]["layer_0"] == [[1, 2]]
        assert data["acoustic_tokens"]["layer_1"] == [[7, 8]]
        assert data["metadata"] == {"x": 1}
