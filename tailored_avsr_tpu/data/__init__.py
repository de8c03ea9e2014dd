from tailored_avsr_tpu.data.tokenizer import (
    CharTokenizer,
    TokenIDConverter,
    get_tokenizer_converter,
    load_token_list,
)
from tailored_avsr_tpu.data.dataset import AVSRDataset
from tailored_avsr_tpu.data.dataloader import AVSRDataLoader, pad_batch
from tailored_avsr_tpu.data import transforms_audio, transforms_video
