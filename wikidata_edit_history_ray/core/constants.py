"""Shared constants: change types, Wikidata datatype families, output column orders.

Semantics mirror the reference engine (caroocortes/wikidata-edit-history):
change-type vocabulary `scripts/const.py:51-65`, datatype families
`scripts/const.py:106-107`, special values `scripts/const.py:94-95`,
pseudo property ids `scripts/const.py:80-81`, output column orders
`scripts/const.py:113-446`.
"""

# --- change types (action_target strings; split on first '_') ---
CREATE_PROPERTY_VALUE = "CREATE_PROPERTY_VALUE"
UPDATE_PROPERTY_VALUE = "UPDATE_PROPERTY_VALUE"
UPDATE_PROPERTY_DATATYPE_METADATA = "UPDATE_PROPERTY_DATATYPE_METADATA"
DELETE_PROPERTY_VALUE = "DELETE_PROPERTY_VALUE"
UPDATE_RANK = "UPDATE_RANK"
CREATE_QUALIFIER_VALUE = "CREATE_QUALIFIER_VALUE"
DELETE_QUALIFIER_VALUE = "DELETE_QUALIFIER_VALUE"
CREATE_REFERENCE_VALUE = "CREATE_REFERENCE_VALUE"
DELETE_REFERENCE_VALUE = "DELETE_REFERENCE_VALUE"

# --- special snak values ---
NO_VALUE = "novalue"
SOME_VALUE = "somevalue"

# --- datatype families ---
WD_STRING_TYPES = (
    "monolingualtext",
    "string",
    "external-id",
    "url",
    "commonsMedia",
    "geo-shape",
    "tabular-data",
    "math",
    "musical-notation",
    "unknown-values",
)
WD_ENTITY_TYPES = (
    "wikibase-item",
    "wikibase-entityid",
    "wikibase-property",
    "wikibase-lexeme",
    "wikibase-sense",
    "wikibase-form",
    "entity-schema",
)

# labels/descriptions are not real P-ids; the engine assigns pseudo ids
LABEL_PROP_ID = -1
DESCRIPTION_PROP_ID = -2

# end-time qualifier properties that re-interpret a qualifier CREATE as soft_deletion
# (reference: scripts/page_parser.py:547-549)
END_TIME_QUALIFIER_PIDS = (582, 8554, 12506, 3416)

# value fields of complex datavalues; every other key is datatype metadata
# (reference: scripts/page_parser.py:263-271)
DATAVALUE_VALUE_FIELDS = (
    "time",
    "amount",
    "text",
    "latitude",
    "longitude",
    "altitude",
    "before",
    "after",
    "timezone",
)
DATAVALUE_IGNORED_FIELDS = ("altitude", "before", "after", "timezone")

# --- output column orders (reference: scripts/const.py:113-201) ---
REVISION_COLS = [
    "prev_revision_id", "revision_id", "entity_id", "timestamp", "week",
    "year_month", "year", "user_id", "username", "user_type", "comment",
    "file_path", "redirect", "q_id_redirect", "entity_label",
]
REVISION_PK = ["revision_id"]

VALUE_CHANGE_COLS = [
    "revision_id", "property_id", "property_label", "value_id", "old_value",
    "new_value", "old_datatype", "new_datatype", "change_target",
    "action", "target", "old_hash", "new_hash", "timestamp", "week", "year_month",
    "year", "label", "entity_id", "is_reverted", "reversion",
    "reversion_timestamp", "revision_id_reversion", "entity_label",
]
VALUE_CHANGE_PK = ["revision_id", "property_id", "value_id", "change_target"]

QUALIFIER_CHANGE_COLS = [
    "revision_id", "property_id", "property_label", "value_id", "qual_property_id",
    "qual_property_label", "value_hash", "old_value", "new_value", "old_datatype",
    "new_datatype", "change_target", "action", "target", "timestamp", "week",
    "year_month", "year", "entity_id", "label", "entity_label",
]
QUALIFIER_CHANGE_PK = [
    "revision_id", "property_id", "value_id", "qual_property_id", "value_hash",
    "change_target",
]

REFERENCE_CHANGE_COLS = [
    "revision_id", "property_id", "property_label", "value_id", "ref_property_id",
    "ref_property_label", "ref_hash", "value_hash", "old_value", "new_value",
    "old_datatype", "new_datatype", "change_target", "action", "target",
    "timestamp", "week", "year_month", "year", "entity_id", "label", "entity_label",
]
REFERENCE_CHANGE_PK = [
    "revision_id", "property_id", "value_id", "ref_property_id", "value_hash",
    "ref_hash", "change_target",
]

DATATYPE_METADATA_CHANGE_COLS = [
    "revision_id", "property_id", "property_label", "value_id", "old_value",
    "new_value", "old_datatype", "new_datatype", "change_target", "action",
    "target", "old_hash", "new_hash", "timestamp", "week", "year_month", "year",
    "entity_id", "label", "entity_label",
]
DATATYPE_METADATA_CHANGE_PK = ["revision_id", "property_id", "value_id", "change_target"]

# shared leading columns of every per-datatype feature table
FEATURE_BASE_COLS = [
    "revision_id", "property_id", "property_label", "value_id", "change_target",
    "new_datatype", "old_datatype", "action", "old_value", "new_value",
]

TEXT_FEATURE_COLS = FEATURE_BASE_COLS + [
    "token_overlap", "old_in_new", "new_in_old", "edit_distance_ratio",
    "complete_replacement", "length_diff_abs", "token_count_old",
    "token_count_new", "levenshtein_distance", "same_value_without_special_char",
    "special_char_count_diff", "char_insertions", "char_deletions",
    "char_substitutions", "adjacent_char_swap", "has_significant_prefix",
    "has_significant_suffix", "entity_label", "value_cosine_similarity", "label",
]

TIME_FEATURE_COLS = FEATURE_BASE_COLS + [
    "date_diff_days", "sign_change", "change_one_to_zero", "day_added",
    "day_removed", "month_added", "month_removed", "different_year",
    "different_day", "different_month", "entity_label", "label",
]

QUANTITY_FEATURE_COLS = FEATURE_BASE_COLS + [
    "sign_change", "precision_change", "length_increase", "length_decrease",
    "whole_number_change", "old_is_prefix_of_new", "new_is_prefix_of_old",
    "same_float_value", "entity_label", "label",
]

GLOBE_FEATURE_COLS = FEATURE_BASE_COLS + [
    "latitude_sign_change", "longitude_sign_change",
    "latitude_whole_number_change", "longitude_whole_number_change",
    "latitude_precision_change", "longitude_precision_change",
    "latitude_length_increase", "latitude_length_decrease",
    "longitude_length_increase", "longitude_length_decrease",
    "latitude_old_is_prefix_of_new", "latitude_new_is_prefix_of_old",
    "latitude_same_float_value", "longitude_old_is_prefix_of_new",
    "longitude_new_is_prefix_of_old", "longitude_same_float_value",
    "entity_label", "label_latitude", "label_longitude",
]

ENTITY_FEATURE_COLS = FEATURE_BASE_COLS + [
    "token_overlap", "old_in_new", "new_in_old", "edit_distance_ratio",
    "complete_replacement", "is_link_change", "old_value_subclass_new_value",
    "new_value_subclass_old_value", "old_value_located_in_new_value",
    "new_value_located_in_old_value", "old_value_has_parts_new_value",
    "new_value_has_parts_old_value", "old_value_part_of_new_value",
    "new_value_part_of_old_value", "old_value_label", "new_value_label",
    "old_value_description", "new_value_description", "entity_label",
    "label_cosine_similarity", "description_cosine_similarity", "label",
]

ENTITY_STATS_COLS = [
    "entity_id", "entity_label", "entity_types_31", "num_revisions",
    "num_value_changes", "num_value_change_creates", "num_value_change_deletes",
    "num_value_change_updates", "num_rank_changes", "num_rank_creates",
    "num_rank_deletes", "num_rank_updates", "num_qualifier_changes",
    "num_reference_changes", "num_datatype_metadata_changes",
    "num_datatype_metadata_creates", "num_datatype_metadata_deletes",
    "num_datatype_metadata_updates", "first_revision_timestamp",
    "last_revision_timestamp", "num_bot_edits", "num_anonymous_edits",
    "num_human_edits", "num_reverted_edits", "num_reversions",
    "num_reverted_edits_create", "num_reverted_edits_delete",
    "num_reverted_edits_update", "file_path",
    # per-entity timing columns (reference: scripts/const.py:437-445).
    # total_xml_parse_time_sec is the envelope/snapshot JSON parse time here
    # (XML parsing happens at ingest in this engine, measured per shard there)
    "total_xml_parse_time_sec", "total_process_time_sec",
    "total_revision_diff_time_sec", "num_revisions_timed",
    "total_feature_creation_sec", "num_feature_creations_timed",
]
ENTITY_STATS_PK = ["entity_id"]

# all logical output tables of the extraction pipeline
CHANGE_TABLES = (
    "revision",
    "value_change",
    "qualifier_change",
    "reference_change",
    "datatype_metadata_change",
    "entity_stats",
    "features_text",
    "features_time",
    "features_quantity",
    "features_globecoordinate",
    "features_entity",
    "doc_spans",
)

TABLE_COLS = {
    "revision": REVISION_COLS,
    "value_change": VALUE_CHANGE_COLS,
    "qualifier_change": QUALIFIER_CHANGE_COLS,
    "reference_change": REFERENCE_CHANGE_COLS,
    "datatype_metadata_change": DATATYPE_METADATA_CHANGE_COLS,
    "entity_stats": ENTITY_STATS_COLS,
    "features_text": TEXT_FEATURE_COLS,
    "features_time": TIME_FEATURE_COLS,
    "features_quantity": QUANTITY_FEATURE_COLS,
    "features_globecoordinate": GLOBE_FEATURE_COLS,
    "features_entity": ENTITY_FEATURE_COLS,
    # span-sequence lineage (per-row invariant: kind, text, media_ref, order)
    "doc_spans": [
        "doc_id", "entity_id", "span_index", "kind", "offset", "media_ref",
        "text_sha1",
    ],
}
