from apg_trajectory_tracking_tpu.models.mlp import (  # noqa: F401
    init_control_net,
    control_net_apply,
)
from apg_trajectory_tracking_tpu.models.simple import (  # noqa: F401
    init_cartpole_net,
    cartpole_net_apply,
)
from apg_trajectory_tracking_tpu.models.rnn import (  # noqa: F401
    init_lstm_net,
    lstm_net_apply,
    init_lstm_state,
)
from apg_trajectory_tracking_tpu.models.resnet import (  # noqa: F401
    init_resnet_net,
    resnet_net_apply,
)
