"""Property fuzz for the X12 parse path (VERDICT r4 item 5).

Two layers, ≥200 generated files total:

1. ENVELOPE-PARITY fuzz — structurally legal files with adversarial
   shapes (multi-ISA interchanges, multi-GS groups, shuffled
   order-independent body segments, component separators inside data
   values, oversized control numbers / sender ids, newline-separated
   wire format, unknown transaction types): the generator tracks the
   expected envelope row stream while it emits segments, and
   parse_x12_file must reproduce it exactly — row order, control
   numbers, per-interchange sender/receiver attribution, per-group
   transaction dates. (Reference anchor: envelope grouping
   silver_x12_parsing.py:1417-1436.)

2. CORRUPTION fuzz — random mutations of valid files (truncation,
   byte deletion/insertion, dropped SE, duplicated ST, empty files,
   non-ASCII noise) through the distributed parse_to_silver path:
   the batch must NEVER crash, corrupt files surface as ERR
   dead-letter rows (quality 0, invalid) or degraded-quality rows,
   and every emitted row carries well-formed JSON payloads.
"""

from __future__ import annotations

import json
import random

import pytest

from ai_fabric_etl_spark.x12 import testgen
from ai_fabric_etl_spark.x12.parsers import parse_x12_file

N_ENVELOPE_FILES = 120
N_MUTANT_FILES = 120


def _fuzz_envelope_file(rng: random.Random):
    """One structurally legal fuzz file + its expected envelope rows."""
    expected: list[dict] = []
    parts: list[str] = []
    for _ in range(rng.randint(1, 3)):  # multi-ISA nesting
        icn_digits = rng.choice([9, 9, 9, 13])  # sometimes oversized
        icn = str(rng.randrange(10 ** (icn_digits - 1), 10**icn_digits))
        sender = rng.choice(
            [f"S{rng.randint(1, 9)}", f"SENDER{rng.randint(1, 99):02d}",
             "OVERSIZED_SENDER_ID_" + "X" * 10]
        )
        receiver = rng.choice(["R1", f"RECV{rng.randint(1, 99):02d}"])
        parts.append(
            f"ISA*00*{'':10}*00*{'':10}*ZZ*{sender:<15}*ZZ*{receiver:<15}"
            f"*250101*1200*^*00501*{icn}*0*T*:"
        )
        for _ in range(rng.randint(1, 2)):  # multi-GS groups
            gcn = str(rng.randint(1, 999_999_999))
            gdate = rng.choice(["20250101", "20240515", "20231231"])
            parts.append(
                f"GS*HC*{sender.strip()}*{receiver.strip()}*{gdate}"
                f"*1200*{gcn}*X*005010X222A1"
            )
            n_st = rng.randint(1, 3)
            for _ in range(n_st):
                ttype = rng.choice(list(testgen._MAKERS) + ["999", "UNK"])
                cn = rng.randint(1, 999_999_999)
                maker = testgen._MAKERS.get(ttype)
                if maker:
                    body = maker[0](rng, cn)
                else:  # unknown type -> generic segment-histogram parser
                    body = [f"ZZZ*{rng.randint(0, 9)}", "REF*D9*X"]
                # spec-legal reorder: the leading header block (BHT/NM1/
                # TRN/N1 entities before any claim/line loop) is
                # order-independent for every parser — shuffle it
                loop_starts = ("CLM", "SV1", "CLP", "SVC", "INS", "EQ",
                               "EB", "STC", "UM", "HCR", "HL", "DTP")
                cut = next(
                    (i for i, s in enumerate(body)
                     if s.split("*", 1)[0] in loop_starts),
                    len(body),
                )
                head = body[:cut]
                rng.shuffle(head)
                body = head + body[cut:]
                if rng.random() < 0.4:  # component separators in values
                    body.append("NTE*ADD*FREE TEXT WITH : COLON : PARTS")
                inner = [f"ST*{ttype}*{cn:09d}", *body]
                inner.append(f"SE*{len(inner) + 1}*{cn:09d}")
                parts.extend(inner)
                expected.append(
                    {
                        "interchange_control_number": icn,
                        "functional_group_number": gcn,
                        "transaction_set_control_number": f"{cn:09d}",
                        "transaction_type": ttype,
                        "sender_id": sender.strip(),
                        "receiver_id": receiver.strip(),
                        "transaction_date": gdate,
                    }
                )
            parts.append(f"GE*{n_st}*{gcn}")
        parts.append(f"IEA*1*{icn}")
    sep = "~" if rng.random() < 0.5 else "~\n"  # newline wire format
    return sep.join(parts) + "~", expected


def test_fuzz_envelope_parity():
    rng = random.Random(20250814)
    n_rows = 0
    for i in range(N_ENVELOPE_FILES):
        content, expected = _fuzz_envelope_file(rng)
        rows = parse_x12_file(f"fuzz_{i:03d}.x12", content)
        assert len(rows) == len(expected), f"file {i}: row count"
        for j, (row, want) in enumerate(zip(rows, expected)):
            for k, v in want.items():
                assert row[k] == v, (
                    f"file {i} set {j}: {k}={row[k]!r}, want {v!r}"
                )
            # payloads always well-formed JSON
            json.loads(row["parsed_data"])
            val = json.loads(row["validation_results"])
            assert isinstance(val["quality_score"], int)
            n_rows += 1
    assert n_rows > N_ENVELOPE_FILES  # multi-set files actually occurred


def _mutate(rng: random.Random, content: str) -> str:
    kind = rng.randrange(8)
    if kind == 0:  # truncate mid-file
        return content[: rng.randint(0, len(content) - 1)]
    if kind == 1:  # delete a random char
        i = rng.randrange(len(content))
        return content[:i] + content[i + 1 :]
    if kind == 2:  # insert random bytes
        i = rng.randrange(len(content))
        noise = "".join(chr(rng.randint(1, 255)) for _ in range(5))
        return content[:i] + noise + content[i:]
    if kind == 3:  # drop every SE (unterminated sets)
        return "~".join(
            s for s in content.split("~") if not s.startswith("SE")
        )
    if kind == 4:  # duplicate an ST mid-set (nested ST)
        segs = content.split("~")
        sts = [i for i, s in enumerate(segs) if s.startswith("ST")]
        if sts:
            i = rng.choice(sts)
            segs.insert(i + 1, segs[i])
        return "~".join(segs)
    if kind == 5:  # empty / whitespace file
        return rng.choice(["", "   ", "\n\n"])
    if kind == 6:  # non-ASCII noise
        return content.replace("*", "é", 3)
    # kind == 7: swap separators entirely (garbage format)
    return content.replace("~", "|").replace("*", ";")


def test_fuzz_corruption_never_crashes_batch(spark):
    """parse_to_silver over 120 mutated files: the job completes, no
    file vanishes silently (every input yields >= 1 row OR was an
    empty/segment-free mutant), ERR rows are dead-lettered with
    quality 0, and every row's JSON fields parse."""
    from ai_fabric_etl_spark.pipeline.silver import parse_to_silver

    rng = random.Random(99)
    base = testgen.generate_corpus(n_files=30, seed=5)
    mutants = []
    for i in range(N_MUTANT_FILES):
        _, content = base[i % len(base)]
        mutants.append((f"mut_{i:03d}.x12", _mutate(rng, content)))

    files = spark.createDataFrame(mutants, ["file_name", "content"])
    out = parse_to_silver(files, batch_id="fuzz").collect()

    by_file: dict[str, list] = {}
    for r in out:
        by_file.setdefault(r["file_name"], []).append(r)
        json.loads(r["parsed_data"])
        val = json.loads(r["validation_results"])
        if r["transaction_type"] == "ERR":
            assert r["quality_score"] == 0 and not r["is_valid"]
            assert val["issues"], "dead-letter row must carry the error"

    for name, content in mutants:
        has_st_se = "ST" in content and "SE" in content
        if name not in by_file:
            # a file may legally yield zero rows only when no ST..SE
            # set survived the mutation
            segs = [s.split("*", 1)[0] for s in content.replace(
                "\n", "").split("~")]
            assert not ("ST" in segs and "SE" in segs), (
                f"{name} had complete sets but produced no rows"
            )
        del has_st_se


def test_fuzz_regression_pins():
    """Pinned shapes from fuzz exploration — each was a candidate
    failure mode; the expected behavior is locked here."""
    # stray SE before any ST: skipped, not crashed, following set parses
    rows = parse_x12_file(
        "pin1.x12",
        "ISA*00*          *00*          *ZZ*S              *ZZ*R"
        "              *250101*1200*^*00501*000000001*0*T*:~"
        "GS*HC*S*R*20250101*1200*1*X*005010X222A1~"
        "SE*2*000000009~"
        "ST*270*000000042~BHT*0022*13*E1*20250101*1200~SE*3*000000042~"
        "GE*1*1~IEA*1*000000001~",
    )
    assert [r["transaction_set_control_number"] for r in rows] == ["000000042"]

    # nested/duplicated ST: the inner ST restarts the set — the open
    # outer set is abandoned (matches the reference's last-writer
    # grouping), and the SE closes the inner one
    rows = parse_x12_file(
        "pin2.x12",
        "ISA*00*          *00*          *ZZ*S              *ZZ*R"
        "              *250101*1200*^*00501*000000002*0*T*:~"
        "GS*HC*S*R*20250101*1200*2*X*005010X222A1~"
        "ST*270*000000001~ST*270*000000002~BHT*0022*13*E2*20250101*1200~"
        "SE*3*000000002~GE*1*2~IEA*1*000000002~",
    )
    assert [r["transaction_set_control_number"] for r in rows] == ["000000002"]

    # unterminated trailing ST (no SE): no phantom row
    rows = parse_x12_file(
        "pin3.x12",
        "ISA*00*          *00*          *ZZ*S              *ZZ*R"
        "              *250101*1200*^*00501*000000003*0*T*:~"
        "GS*HC*S*R*20250101*1200*3*X*005010X222A1~"
        "ST*270*000000007~BHT*0022*13*E3*20250101*1200~"
        "GE*1*3~IEA*1*000000003~",
    )
    assert rows == []

    # numeric fields with junk: CLM amount 'ABC' reads as 0.0, parse
    # still succeeds (Segment.num guard)
    rows = parse_x12_file(
        "pin4.x12",
        "ISA*00*          *00*          *ZZ*S              *ZZ*R"
        "              *250101*1200*^*00501*000000004*0*T*:~"
        "GS*HC*S*R*20250101*1200*4*X*005010X222A1~"
        "ST*837*000000011~BHT*0019*00*R*20250101*1200*CH~"
        "CLM*C1*ABC***11:B:1~SV1*HC:99213*NOTNUM*UN*X~"
        "SE*5*000000011~GE*1*4~IEA*1*000000004~",
    )
    assert len(rows) == 1
    payload = json.loads(rows[0]["parsed_data"])
    assert payload["claims"][0]["total_claim_amount"] == 0.0
    assert payload["claims"][0]["service_lines"][0]["line_amount"] == 0.0


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
