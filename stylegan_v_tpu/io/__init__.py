from .checkpoint import (  # noqa: F401
    copy_params,
    find_latest_snapshot,
    load_snapshot,
    save_snapshot,
)
from .legacy import (  # noqa: F401
    convert_discriminator_state,
    convert_generator_state,
    flatten_module_state,
    load_network_pkl,
)
