from .lineage import LINEAGE_SCHEMA, StateStore, run_stage
