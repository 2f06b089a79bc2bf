"""Hash-exact markov model tests.

Goldens are copied from the reference's sqllogictest expectations
(query/window_function/window_basic.test:85-89 and
query/functions/02_0000_function_markov.test:60-81) — they pin the
crc32 NGramHash context keying, the finalize() parameter semantics and
the byte-exact generator port (Rust DefaultHasher / SipHash-1-3).
"""

from databend_spark.operators.markov import (
    markov_generate,
    markov_train_display,
)

NAMES = [
    "James Smith", "Mary Johnson", "John Williams", "Patricia Brown",
    "Robert Jones", "Jennifer Garcia", "Michael Miller", "Linda Davis",
    "William Rodriguez", "Elizabeth Martinez", "James Johnson",
    "Mary Williams", "John Brown", "Patricia Jones", "Robert Garcia",
    "Jennifer Miller", "Michael Davis", "Linda Rodriguez",
    "William Martinez", "Elizabeth Smith", "James Williams", "Mary Brown",
    "John Jones", "Patricia Garcia", "Robert Miller", "Jennifer Davis",
    "Michael Rodriguez", "Linda Martinez", "William Smith",
    "Elizabeth Johnson", "James Brown", "Mary Jones", "John Garcia",
    "Patricia Miller", "Robert Davis", "Jennifer Rodriguez",
    "Michael Martinez", "Linda Smith", "William Johnson",
    "Elizabeth Williams", "James Jones", "Mary Garcia", "John Miller",
    "Patricia Davis", "Robert Rodriguez", "Jennifer Martinez",
    "Michael Smith", "Linda Johnson", "William Williams",
    "Elizabeth Brown",
]


def test_train_display_matches_reference_golden():
    got = markov_train_display(["ab", "ac", "ad"], 1, 0, 0, 1, 0.0)
    assert got == "[(0,6,4,{97:4,98:2,99:2,100:2})]"


def test_generate_matches_reference_golden():
    model = markov_train_display(NAMES)
    params = '{"order":5,"sliding_window_size":8}'
    expect = {
        "James Smith": "John Garcia",
        "Mary Johnson": "Mary Johnson",
        "John Williams": "Robert Jones",
        "Patricia Brown": "Jennifer Martinez",
        "Robert Jones": "Michael Martinez",
        "Jennifer Garcia": "Patricia Brown",
        "Elizabeth Smith": "Williams",
    }
    for src, out in expect.items():
        assert markov_generate(model, params, 0, src) == out


def test_generate_is_deterministic_per_seed():
    model = markov_train_display(NAMES)
    params = '{"order":5,"sliding_window_size":8}'
    a = markov_generate(model, params, 7, "James Smith")
    b = markov_generate(model, params, 7, "James Smith")
    assert a == b
    assert markov_generate(model, params, 8, "James Smith") != a or a
