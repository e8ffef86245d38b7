from matchmaker_tpu.losses.pairwise import (
    margin_mse,
    margin_mse_interpassage,
    mse_teacher_pointwise,
    mse_teacher_pointwise_passages,
    kldiv_teacher_pointwise,
    ranknet,
    ranknet_teacher,
    mse_ranknet_teacher,
    margin_ranking,
)
from matchmaker_tpu.losses.listwise import (
    listnet,
    kldiv_teacher_list,
    smooth_mrr,
    soft_cross_entropy,
    lambda_loss,
    lambda_loss_teacher,
)
from matchmaker_tpu.losses.qa import qa_start_end_cross_entropy
from matchmaker_tpu.losses.dispatch import LossBundle, get_loss, merge_loss
