"""spark-submit entrypoint: pages → decode → way/relation geometry,
through the co-bucketed warehouse layout, resumable.

Ship with::

    zip -r osmspark.zip osmspark
    spark-submit --py-files osmspark.zip osmspark/jobs/geometry_job.py \
        --pages /data/pages --out /data/out --state /data/state \
        --buckets 128

Stages (each lineage-checkpointed, so a killed job resumes where it
died):

1. ``layout``  — decode nodes + ways once and write the co-bucketed
   refs/nodes tables (``write_way_join_bucketed``): both sides
   bucketed+sorted on node id. This is the one pass that pays the big
   shuffle — every later geometry build reads it back shuffle-free.
2. ``way_geom`` — assemble way geometries from the bucketed tables
   (SortMergeJoin, zero Exchange on the join) and write them.
3. ``rel_geom`` — assemble relation (multipolygon) geometries reusing
   the stage-2 output via ``way_geoms=`` (member-keyed join only).

The reference's consumers re-run the refs×nodes join per analysis
(osm-read emits nodeRefs/members only — lib/pbfParser.js:443-531); this
job materializes it once at the warehouse layer.
"""

from __future__ import annotations

import argparse


def main(argv: list[str] | None = None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--state", required=True)
    ap.add_argument("--buckets", type=int, default=128)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from osmspark.pages import read_pages
    from osmspark.pbf.source import (
        nodes_from_pages, relations_from_pages, ways_from_pages)
    from osmspark.session import get_spark
    from osmspark.spatial import (
        assemble_relation_geometries, assemble_way_geometries_bucketed,
        register_way_join_tables, write_way_join_bucketed)
    from osmspark.state import StateStore, run_stage

    spark = get_spark(app="osmspark-geometry", master=args.master)
    store = StateStore(spark, args.state)
    pages = read_pages(spark, args.pages)
    refs_table, nodes_table = "geomjob_refs", "geomjob_nodes"
    layout_root = f"{args.out}/bucketed"

    def build_layout(unit: str):
        write_way_join_bucketed(
            nodes_from_pages(pages).select("id", "lat", "lon"),
            ways_from_pages(pages).select("id", "node_refs"),
            layout_root, n_buckets=args.buckets,
            refs_table=refs_table, nodes_table=nodes_table)
        # lineage row records the refs row count for the metrics table
        return spark.table(refs_table)

    run_stage(store, "layout", ["all"], build_layout, write=False)
    # resume path: tables may predate this session's catalog
    register_way_join_tables(spark, layout_root, args.buckets,
                             refs_table, nodes_table)

    way_path = f"{args.out}/way_geom/unit=all"

    def build_way_geom(unit: str):
        return assemble_way_geometries_bucketed(spark, refs_table,
                                                nodes_table)

    run_stage(store, "way_geom", ["all"], build_way_geom,
              out_root=args.out)

    def build_rel_geom(unit: str):
        return assemble_relation_geometries(
            relations_from_pages(pages),
            way_geoms=spark.read.parquet(way_path))

    run_stage(store, "rel_geom", ["all"], build_rel_geom,
              out_root=args.out)

    store.metrics().show(truncate=False)
    return spark


if __name__ == "__main__":
    main().stop()
