"""Shared synthetic fixtures — re-exported from the package so the shipping
multi-chip dry run (`__graft_entry__.dryrun_multichip`) never imports the test
tree (VERDICT r3 item 7)."""

from gsplat_tpu.io.synthetic import look_at_rig, make_colmap_scene  # noqa: F401
