from .i3d import InceptionI3d, convert_i3d_state_dict, i3d_features_fn  # noqa: F401
from .c3d import C3D, convert_c3d_state_dict, c3d_features_fn  # noqa: F401
