from keds_tpu.models.clip import (  # noqa: F401
    ClipConfig,
    VIT_L_14,
    init_clip,
    encode_image,
    encode_text,
    get_text_tokens,
    encode_text_img,
    encode_text_img_retrieval,
    encode_text_img_train,
)
from keds_tpu.models.heads import (  # noqa: F401
    init_im2text,
    init_crossformer,
    im2text_apply,
    crossformer_apply,
)
