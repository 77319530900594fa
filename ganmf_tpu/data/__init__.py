from ganmf_tpu.data.reader import (
    InteractionReader,
    build_icm,
    kcore_filter,
    read_item_features,
    split_urm,
)
from ganmf_tpu.data.splits import (
    SplitSet,
    load_reference_splits,
    make_experiment_splits,
    save_experiment_splits,
)
from ganmf_tpu.data.device import DeviceURM
