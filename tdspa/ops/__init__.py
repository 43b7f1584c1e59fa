from tdspa.ops.geometry import (
    bilinear_sample,
    lift_2d_to_3d,
    sample_dino_features_for_tracks,
    sample_depth_features_for_tracks,
    project_3d_to_2d,
    project_all_tracks,
)
