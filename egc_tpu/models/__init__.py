from egc_tpu.models.encoders import (  # noqa: F401
    AtomEncoder, ASTNodeEncoder,
)
from egc_tpu.models.nets import (  # noqa: F401
    ZincNet, CifarNet, HIVNet, ArxivNet, CodeNet, MagNet, make_conv,
    MODEL_KINDS,
)
