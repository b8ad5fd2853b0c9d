"""Coded-concept decode layer for the visit summary (SURVEY §2.8 C2-C4).

The reference decodes ~28 clinical indicators with CASE/REGEXP ladders over
the serialized obs blob (flat_visit_summary_v1.0.sql:201-523).  The engine
re-expresses each ladder as a table-driven ``when()`` chain over the
canonical ``obs_map`` column (MapType(int -> array<string>)): membership is
``array_contains(element_at(obs_map, concept), code)`` — a Catalyst-native
map probe inside whole-stage codegen, no regex over a packed string, no UDF.

Semantics preserved exactly:
* first-match priority — a multimap can satisfy several branches; MySQL CASE
  takes the first listed, so branch order in the tables below is the
  reference's order (SURVEY §7.4.6);
* the ``default`` ("No" for the tests-done flags, raw-value fallback for
  patient_source) mirrors each ladder's ELSE arm.

Deliberate divergences (LEGACY_QUIRKS: SURVEY §2.11):
* who_stage (quirk 1): the reference tests ``6794=(6790)`` in all four stage
  branches, so stages 2-4 are unreachable; the engine decodes the intent
  6790/6791/6792/6793 -> "1"/"2"/"3"/"4", 1852 -> "Not Stage".
* no_of_day_hospitalized (quirk 6): presence test ``!!1534=`` but extraction
  searched ``!!(1534)=`` and returned blob-head garbage; engine extracts the
  first 1534 value.
* value extraction (quirk 12): the reference's LOCATE/SUBSTRING_INDEX
  arithmetic concatenates all occurrences of a repeated concept; the engine
  returns the first stored value (the map keeps the full array for callers
  that want every occurrence).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from mrsboraetl_spark.functions.obsmap import map_first_value

__all__ = ["CODED_LADDERS", "EXTRACTED_COLS", "decode_coded", "decode_columns"]


# col -> (concept_id, [(answer_code, label), ...], default)
# Branch order is the reference's CASE order (first match wins).
CODED_LADDERS: dict[str, tuple[int, list[tuple[int, str]], str | None]] = {
    # flat_visit_summary_v1.0.sql:210-219
    "pregnant": (1836, [
        (1065, "Yes"), (1066, "No"), (6765, "MC-Recently Miscarried"),
        (50, "AB-Recently Induced Abortion"), (6847, "Live Birth"),
        (6848, "Still Birth"),
    ], None),
    # :221-227
    "fp_status": (5271, [(1065, "FP"), (1066, "No FP"), (6765, "WFP")], None),
    # :229-243
    "fp_method": (374, [
        (190, "Condoms (C)"), (6495, "Emergency Contraceptive (ECP)"),
        (780, "Oral Contraceptive Pills (OC)"), (5279, "Injectables (INJ)"),
        (1713, "Implant (IMP)"), (5275, "Intrauterine Devices (IUD)"),
        (6496, "Lactational Amenorrhea (LAM)"),
        (5278, "Diaphragm/Cervical Cap (D)"),
        (6783, "Fertility Awareness(FA)"),
        (5276, "Female Sterilization (BTL/TL)"), (1771, "Vasectomy (V)"),
    ], None),
    # :245-254
    "why_not_on_fp": (6758, [
        (1447, "Wants to get pregnant (WP)"),
        (6757, "Thinks can't get pregnant (UP)"),
        (6765, "Not sexually active now (NSex)"), (6368, "Pregnant"),
        (6854, "Abdominal hysterectomy(TAH)"), (6825, "Undecided(UND)"),
    ], None),
    # :256-263
    "tb_status": (6150, [
        (1066, "NO Signs"), (6182, "TB Suspected"), (6183, "TB Rx"),
        (6151, "Not done (ND)"),
    ], None),
    # :265-274
    "side_effects": (6175, [
        (1107, "None"), (5978, "Nausea (N)"), (512, "Rash (R)"),
        (620, "Headache (H)"), (16, "Diarrhoea (D)"), (3, "Anaemia (A)"),
    ], None),
    # :302-309
    "cur_arv_adherence": (6760, [
        (1384, "GOOD"), (1385, "FAIR"), (1386, "POOR"), (1175, "N/A"),
    ], None),
    # :312-319 — intent (quirk 1 fixed; see module docstring)
    "who_stage": (6794, [
        (6790, "1"), (6791, "2"), (6792, "3"), (6793, "4"),
        (1852, "Not Stage"),
    ], None),
    # :321-327
    "ctx_adherence": (6761, [
        (1384, "Good"), (1385, "Fair"), (1386, "Poor"), (1175, "N/A"),
    ], None),
    # :329-334
    "ctx_dispensed": (1565, [(1427, "Yes"), (1066, "No"), (92, "Dapson")], None),
    # :337-342
    "inh_dispensed": (6785, [(1065, "Yes"), (1066, "No"), (1175, "N/A")], None),
    # :344-348
    "other_medications_dispensed": (6784, [(1065, "Yes"), (1066, "No")], None),
    # :350-357
    "arvs_adherence": (6760, [
        (1384, "Good"), (1385, "Fair"), (1386, "Poor"), (1175, "N/A"),
        (8015, "Stopped"),
    ], None),
    # :359-375
    "why_arvs_adherence_poor": (6171, [
        (1413, "Toxicity/Side effects"), (6169, "Share with others"),
        (1410, "Forgot"), (6168, "Felt better"), (1415, "Felt too ill"),
        (1411, "Stigma, disclosure or privacy issues"),
        (1417, "Drug stock out"), (1414, "Patient lost/run out of pills"),
        (820, "Delivery/transport problems"), (6170, "Inability to pay"),
        (1624, "Alcohol"), (207, "Depression"), (6202, "Pill burden"),
        (5622, "Other (Specify)"),
    ], None),
    # :377-380
    "pmtct_ppct": (1592, [(1405, "PMTCT/PPCT")], None),
    # :382-423 (~40 branches; note 6297 appears twice — first match wins,
    # exactly like the reference CASE)
    "currentregmen": (1571, [
        (628, "3TC"), (814, "ABC"), (6285, "AF1A/CF1A-3TC/AZT/NVP"),
        (6286, "AF1B/CF1B-3TC/AZT/EFV"), (6288, "AF2A-3TC/NVP/TDF"),
        (6289, "AF2B-3TC/EFV/TDF"), (6284, "AF3A/CF3A-3TC/d4t/NVP"),
        (6287, "AF3B/CF3B-3TC/d4t/EFV"), (6290, "AO1A/CF2A-3TC/ABC/NVP"),
        (6291, "AO1B/CF2B-3TC/ABC/EFV"), (6297, "AO1C/CF2D-3TC/ABC/LPV"),
        (6293, "AS1A/CF1C/CS1A-3TC/AZT/LPV/r"), (6298, "AS1C/CF2C-3TC/ABC/AZT"),
        (6296, "AS2A-3TC/LPV/r/TDF"), (6292, "AS2D-ABC/LPV/r/TDF"),
        (6294, "AS4A/CS3A-3TC/d4t/LPV/r"), (797, "AZT-ZIDOVUDINE"),
        (6299, "CS1B-ABC/AZT/LPV/r"), (6297, "CS2A-3TC/ABC/LPV/r"),
        (625, "d4t-STAVUDINE"), (633, "AFV-EFAVIRENZ"),
        (794, "LPV/r-LOPINAVIR AND RITONAVIR"), (635, "NVF-NELFINAVIR"),
        (631, "NVP-NEVIRAPINE"), (802, "TDF-TENOFOVIR"),
        (5424, "Other-OTHER ANTIRETROVIRAL DRUG"), (7500, "AS2C-TDF/3TC/ATV/r"),
        (7501, "AS1B-AZT-3TC-ATV/r"), (7499, "ATV/r - Atazanavir/Ritonavir"),
        (7621, "AS5B-ABC/3TC/ATV/r"), (7626, "AS6X-D4T/3TC/ATV/r"),
        (7642, "TDF/3TC/LPV/r-CF4C"), (7644, "TDF/3TC/ATV/r-CF4D"),
        (7643, "TDF/3TC/LPV/r-CS4X"), (7645, "TDF/3TC/ATV/r-CS4X"),
        (7649, "ABC/3TC/LPV/r-AS5A"), (7652, "AZT/TDF/EFV"),
        (7653, "ABC/3TC/EFV-AF4B"), (7654, "ABC/3TC/NVP-AF4A"),
    ], None),
    # tests-done flags :425-449 — ELSE arm is "No", not NULL
    "cd4_cd4percentage_done": (1271, [(5497, "Yes")], "No"),
    "hgb_done": (1271, [(21, "Yes")], "No"),
    "rpr_done": (1271, [(1569, "Yes")], "No"),
    "tb_sputum_done": (1271, [(1883, "Yes")], "No"),
    "other_test_done": (1271, [(5622, "Yes")], "No"),
    # :452-465 (1167 repeats: "Disclosure counseling" wins, like the CASE)
    "refferal_hospitalized": (1272, [
        (1107, "None"), (5488, "Adherence counseling (AD)"),
        (1356, "ANC/PMTCT"), (1167, "Disclosure counseling (DC)"),
        (5483, "Family planning (FP)"),
        (5485, "Inpatient care/hospitalization"),
        (5484, "Nutritional services (NS)"),
        (5486, "Social support group (SSG)"),
        (5490, "Psychosocial counseling (PC)"),
        (5487, "TB treatment/Dot program (TB)"), (1167, "Other (specify)"),
    ], None),
    # :472-477
    "breastfing_mode": (1151, [
        (5526, "Breastfed exclusively (EBF)"),
        (1708, "Exclusive Replacement Feeding (ERF)"),
        (6046, "Mixed Feeding (MF)"),
    ], None),
    # :479-489
    "at_risk_population": (6181, [
        (6180, "Client to sex worker (cSW)"), (6090, "Discorded couple (DC)"),
        (1505, "Fisher folk (FF)"), (105, "Injection drug user (IDU)"),
        (6179, "Same sex partnership (SSP/MSM)"), (6177, "Sex worker (SW)"),
        (6178, "Truck driver (TD)"), (1175, "N/A"),
    ], None),
    # :491-517
    "pwp_disclosure": (1048, [(1065, "Yes"), (1066, "No"), (1175, "N/A")], None),
    "pwp_partner_tested": (1363, [(1065, "Yes"), (1066, "No"), (1175, "N/A")], None),
    "condoms_dispensed": (6781, [(1065, "Yes"), (1066, "No"), (1175, "N/A")], None),
    "sti_screened": (6780, [(1065, "Yes"), (1066, "No"), (1175, "N/A")], None),
}

# col -> (concept_id, cast) — first-value extraction (C4; quirks 6/12 fixed)
EXTRACTED_COLS: dict[str, tuple[int, str | None]] = {
    "weight": (6743, None),                       # :201-203
    "height": (6744, None),                       # :205-207
    "enrollment_date": (6746, "timestamp"),       # :278-281
    "no_of_day_hospitalized": (1534, None),       # :467-470
    "tca": (5096, "timestamp"),                   # :520-523
}


def _has_code(obs_map: Column, concept: int, code: int) -> Column:
    vals = F.element_at(obs_map, F.lit(concept))
    return F.coalesce(F.array_contains(vals, str(code)), F.lit(False))


def decode_coded(
    obs_map: Column,
    concept: int,
    ladder: list[tuple[int, str]],
    default: str | None = None,
) -> Column:
    """One CASE ladder: first (code -> label) whose code appears among the
    concept's values wins; else ``default``."""
    expr: Column | None = None
    for code, label in ladder:
        cond = _has_code(obs_map, concept, code)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    assert expr is not None
    return expr.otherwise(F.lit(default))


def decode_columns(obs_map: Column) -> dict[str, Column]:
    """All visit-summary decode columns keyed by output name."""
    out: dict[str, Column] = {}
    for name, (concept, ladder, default) in CODED_LADDERS.items():
        out[name] = decode_coded(obs_map, concept, ladder, default)
    for name, (concept, cast) in EXTRACTED_COLS.items():
        col = map_first_value(obs_map, concept)
        out[name] = col.cast(cast) if cast else col
    # patient_source (:283-296): ladder whose ELSE falls back to the raw
    # extracted value instead of NULL — decode_coded with default=None
    # yields NULL on no-match, so coalesce reproduces the fallback exactly.
    ladder = [
        (1356, "PMTCT"), (1354, "VCT"), (6767, "IPD-Ad"), (1360, "TB Clinic"),
        (1357, "OPD"), (6768, "IPD-Ch"), (1358, "MCH-Child"), (1828, "VMMC"),
        (1355, "Family Member"), (5622, "Other"),
    ]
    out["patient_source"] = F.coalesce(
        decode_coded(obs_map, 1353, ladder), map_first_value(obs_map, 1353)
    )
    return out
