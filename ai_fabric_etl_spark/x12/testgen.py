"""Deterministic X12 test-corpus generator (our own, seed-stable).

Same *shape* as the reference corpus (testdata/README.md: 9 types,
deterministic provider/payer pools, ISA15=T test flag) but generated
from scratch for this repo's tests.
"""

from __future__ import annotations

import random

PROVIDERS = [
    ("PROV001", "1112223334"),
    ("PROV002", "2223334445"),
    ("PROV003", "3334445556"),
    ("PROV004", "4445556667"),
    ("PROV005", "5556667778"),
]
PAYERS = ["PAYER001", "PAYER002", "PAYER003", "PAYER004", "PAYER005"]


def _envelope(body_sets: list[list[str]], sender: str, receiver: str,
              icn: int, gcn: int, func_code: str) -> str:
    segs = [
        f"ISA*00*{'':10}*00*{'':10}*ZZ*{sender:<15}*ZZ*{receiver:<15}"
        f"*250101*1200*^*00501*{icn:09d}*0*T*:",
        f"GS*{func_code}*{sender}*{receiver}*20250101*1200*{gcn}*X*005010X222A1",
    ]
    for body in body_sets:
        segs.extend(body)
    segs.append(f"GE*{len(body_sets)}*{gcn}")
    segs.append(f"IEA*1*{icn:09d}")
    return "~".join(segs) + "~"


def _set(txn_type: str, cn: int, body: list[str]) -> list[str]:
    inner = [f"ST*{txn_type}*{cn:09d}", *body]
    inner.append(f"SE*{len(inner) + 1}*{cn:09d}")
    return inner


def make_837(rng: random.Random, cn: int) -> list[str]:
    prov, npi = rng.choice(PROVIDERS)
    n_lines = rng.randint(1, 5)
    amounts = [round(rng.uniform(50, 2000), 2) for _ in range(n_lines)]
    total = round(sum(amounts), 2)
    body = [
        f"BHT*0019*00*REF{cn}*20250101*1200*CH",
        f"NM1*85*2*{prov}*****XX*{npi}",
        "NM1*IL*1*DOE*JANE****MI*MBR001",
        "NM1*QC*1*DOE*JANE",
        f"CLM*CLM{cn}*{total}***11:B:1*Y*A*Y*Y",
    ]
    for i, amt in enumerate(amounts):
        body.append(f"SV1*HC:9921{i}*{amt}*UN*{rng.randint(1, 4)}***1")
        body.append("DTP*472*D8*20250101")
    return body


def make_835(rng: random.Random, cn: int) -> list[str]:
    n_claims = rng.randint(1, 3)
    body: list[str] = []
    total_paid = 0.0
    claims = []
    for i in range(n_claims):
        charge = round(rng.uniform(100, 3000), 2)
        paid = round(charge * rng.uniform(0.5, 1.0), 2)
        pr = round(charge - paid, 2)
        total_paid = round(total_paid + paid, 2)
        claims.append((i, charge, paid, pr))
    body.append(f"BPR*I*{total_paid}*C*ACH*CCP***********20250101")
    body.append(f"TRN*1*TRACE{cn}*1234567890")
    body.append(f"N1*PR*{rng.choice(PAYERS)}")
    body.append("N1*PE*PROVIDER CLINIC")
    for i, charge, paid, pr in claims:
        body.append(f"CLP*PMT{cn}{i}*1*{charge}*{paid}*{pr}*12*ICN{cn}{i}")
        body.append(f"SVC*HC:99213*{charge}*{paid}**{rng.randint(1, 3)}")
    return body


def make_834(rng: random.Random, cn: int) -> list[str]:
    body = [f"BGN*00*REF{cn}*20250101*1200", "N1*P5*ACME CORP*FI*123456789"]
    for i in range(rng.randint(1, 4)):
        code = rng.choice(["021", "024", "001"])
        body.append(f"INS*Y*18*{code}*XN*A*E**FT")
        body.append(f"NM1*IL*1*SMITH*PAT****34*SSN{cn}{i}")
        body.append("HD*021**HLT*PLAN A")
    return body


def make_270(rng: random.Random, cn: int) -> list[str]:
    prov, npi = rng.choice(PROVIDERS)
    body = [
        f"BHT*0022*13*ELI{cn}*20250101*1200",
        "HL*1**20*1",
        f"NM1*1P*2*{prov}*****XX*{npi}",
        "NM1*IL*1*DOE*JOHN****MI*MBR002",
    ]
    for _ in range(rng.randint(1, 3)):
        body.append(f"EQ*{rng.choice(['30', '1', '47', '88'])}")
    return body


def make_271(rng: random.Random, cn: int) -> list[str]:
    body = [
        f"BHT*0022*11*ELI{cn}*20250101*1200",
        "HL*1**20*1",
        f"NM1*PR*2*{rng.choice(PAYERS)}",
        "NM1*IL*1*DOE*JOHN****MI*MBR002",
    ]
    for _ in range(rng.randint(1, 4)):
        body.append(
            f"EB*{rng.choice(['1', '6', 'C'])}*IND*30**{rng.choice(['', 'GOLD'])}"
            f"**{round(rng.uniform(0, 500), 2)}*{round(rng.uniform(0, 1), 2)}"
        )
    return body


def make_276(rng: random.Random, cn: int) -> list[str]:
    prov, npi = rng.choice(PROVIDERS)
    return [
        f"BHT*0010*13*STA{cn}*20250101*1200",
        f"TRN*1*TRC{cn}*9876543210",
        f"NM1*1P*2*{prov}*****XX*{npi}",
        "NM1*IL*1*DOE*JOHN****MI*MBR003",
    ]


def make_277(rng: random.Random, cn: int) -> list[str]:
    body = [
        f"BHT*0010*08*STA{cn}*20250101*1200",
        f"NM1*PR*2*{rng.choice(PAYERS)}",
    ]
    for i in range(rng.randint(1, 3)):
        charge = round(rng.uniform(100, 2000), 2)
        paid = round(charge * rng.uniform(0, 1), 2)
        body.append(f"STC*A1:20*20250101*WQ*{charge}*{paid}")
    return body


def make_278(rng: random.Random, cn: int) -> list[str]:
    prov, npi = rng.choice(PROVIDERS)
    body = [
        f"BHT*0007*13*AUTH{cn}*20250101*1200",
        "HL*1**20*1",
        "NM1*X3*2*UMO ORG",
        f"NM1*1P*2*{prov}*****XX*{npi}",
        "UM*HS*I*2",
    ]
    for i in range(rng.randint(1, 3)):
        body.append(f"SV1*HC:9928{i}*{round(rng.uniform(100, 5000), 2)}*UN*{rng.randint(1, 10)}")
    body.append("DTP*472*D8*20250110")
    return body


def make_279(rng: random.Random, cn: int) -> list[str]:
    body = [
        f"BHT*0007*11*AUTH{cn}*20250101*1200",
        "HL*1**20*1",
    ]
    for i in range(rng.randint(1, 3)):
        code = rng.choice(["A1", "A2", "A3", "A4", "A6", "CT", "DJ", "PA", "PN"])
        body.append(f"HCR*{code}*CERT{cn}{i}")
    body.append("MSG*REVIEW COMPLETE")
    return body


_MAKERS = {
    "837": (make_837, "HC"),
    "835": (make_835, "HP"),
    "834": (make_834, "BE"),
    "270": (make_270, "HS"),
    "271": (make_271, "HB"),
    "276": (make_276, "HR"),
    "277": (make_277, "HN"),
    "278": (make_278, "HI"),
    "279": (make_279, "HI"),
}


def generate_corpus(n_files: int = 27, seed: int = 7) -> list[tuple[str, str]]:
    """Deterministic (file_name, content) corpus covering all 9 types,
    multiple senders/receivers, 1-3 transaction sets per file."""
    rng = random.Random(seed)
    types = list(_MAKERS)
    out: list[tuple[str, str]] = []
    for i in range(n_files):
        txn_type = types[i % len(types)]
        maker, func_code = _MAKERS[txn_type]
        sender = f"SENDER{(i % 3) + 1:02d}"
        receiver = f"RECV{(i % 2) + 1:02d}"
        n_sets = rng.randint(1, 3)
        sets = []
        for j in range(n_sets):
            cn = 1000 * (i + 1) + j
            sets.append(_set(txn_type, cn, maker(rng, cn)))
        content = _envelope(sets, sender, receiver, icn=10_000 + i, gcn=500 + i,
                            func_code=func_code)
        out.append((f"test_{txn_type}_{i:03d}.x12", content))
    return out


def expected_silver(
    n_files: int = 27, seed: int = 7, batch_id: str = "entry", now=None
) -> list[dict]:
    """Spec-derived ground truth for the envelope surface of the
    silver parse — one dict per ST..SE set, built from the generator's
    OWN loop (control numbers, partners, GS date) without ever running
    the parser. Quality is a spec-level constant: every maker emits
    all of validate.REQUIRED_SEGMENTS for its type with a correct SE
    count, and the envelope always carries sender/receiver/ICN, so
    issues = warnings = 0 → score 100, valid. This is the independent
    oracle the driver hashes x12_silver_transactions against.
    """
    from datetime import datetime

    now = now or datetime(2025, 1, 2, 12, 0, 0)
    rng = random.Random(seed)
    types = list(_MAKERS)
    out: list[dict] = []
    for i in range(n_files):
        txn_type = types[i % len(types)]
        maker, _ = _MAKERS[txn_type]
        n_sets = rng.randint(1, 3)
        for j in range(n_sets):
            cn = 1000 * (i + 1) + j
            maker(rng, cn)  # consume the body's randomness; content unused
            out.append(
                {
                    "batch_id": batch_id,
                    "file_name": f"test_{txn_type}_{i:03d}.x12",
                    "processing_timestamp": now,
                    "interchange_control_number": f"{10_000 + i:09d}",
                    "functional_group_number": str(500 + i),
                    "transaction_set_control_number": f"{cn:09d}",
                    "transaction_type": txn_type,
                    "sender_id": f"SENDER{(i % 3) + 1:02d}",
                    "receiver_id": f"RECV{(i % 2) + 1:02d}",
                    "transaction_date": "20250101",
                    "quality_score": 100,
                    "is_valid": True,
                    "processing_date": now.date(),
                }
            )
    return out
