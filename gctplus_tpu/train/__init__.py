from gctplus_tpu.train.loss import elbo_loss, kl_annealing_beta
from gctplus_tpu.train.schedule import noam_schedule, make_optimizer
from gctplus_tpu.train.trainer import TrainState, make_train_step, make_eval_step
