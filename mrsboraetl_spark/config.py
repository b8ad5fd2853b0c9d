"""Engine constants mirroring the reference's session variables.

Reference sites: @boundary/@sep (flat_obs_v1.0.sql:32,134), lab concept
whitelist (flat_lab_obs_v1.0.sql:91), excluded TESTS-ORDERED=NONE pair
(flat_lab_obs_v1.0.sql:131), encounter types (flat_visit_summary_v1.0.sql:14,
142-155), synthetic-id offsets (flat_obs_v1.0.sql:29,161), watermark epoch
fallback (flat_obs_v1.0.sql:70).
"""

from __future__ import annotations

# Serialized obs-blob encoding: !!<concept_id>=<value>!! ## !!...!!
BLOB_BOUNDARY = "!!"
BLOB_SEP = " ## "

# Lab concept whitelist (flat_lab_obs_v1.0.sql:91)
LAB_CONCEPTS = [
    856, 5497, 730, 21, 653, 790, 12, 1030, 1040, 1271, 9508, 6126, 887,
    6252, 1537, 857,
]

# "TESTS ORDERED = NONE" exclusion (flat_lab_obs_v1.0.sql:131)
TESTS_ORDERED_CONCEPT = 1271
TESTS_ORDERED_NONE = 1107

# Encounter types (flat_visit_summary_v1.0.sql:14,142-155)
CLINICAL_ENCOUNTER_TYPES = [21, 22]
LAB_ENCOUNTER_TYPE = 99999
DEATH_ENCOUNTER_TYPE = 31  # declared but unused in the reference (quirk 11)

# Synthetic-id offsets (flat_obs_v1.0.sql:29,161)
FAKE_VISIT_ID_BASE = 10_000_000
SYNTHETIC_ENCOUNTER_OFFSET = 100_000_000

# Watermark epoch fallback (flat_obs_v1.0.sql:70)
WATERMARK_EPOCH = "1900-01-01 00:00:00"

# flat_log table-version tags (flat_obs_v1.0.sql:23 etc.)
TABLE_VERSIONS = {
    "flat_obs": "flat_obs_v1.0",
    "flat_orders": "flat_orders_v1.0",
    "flat_lab_obs": "flat_lab_obs_v1.0",
    "flat_visit_summary": "flat_visit_summary_v1.0",
    "flat_latest_hiv_summary": "flat_latest_hiv_summary_v1.0",
}
