"""Adult-prior default config (reference configs/default_pose_gen_configs.py).

Same keys and values; the torch `config.device` key is replaced by a platform
string (devices are a jit-time concern in JAX).
"""
import ml_collections


def get_default_configs():
    config = ml_collections.ConfigDict()
    config.OUTPUT_DIR = "./output"
    config.DATASET = ml_collections.ConfigDict()
    config.DATASET.TRAIN_DATASET = "h36m"
    config.DATASET.TEST_DATASET = "h36m"
    config.DATASET.HYBRID_JOINTS_TYPE = ""
    # adult joint count (the reference only defines NUM_JOINT in the infant
    # defaults; the adult training/eval paths here read it uniformly)
    config.DATASET.NUM_JOINT = 17

    config.training = training = ml_collections.ConfigDict()
    config.training.batch_size = 50000
    config.GPUs = [0]
    training.n_iters = 1300001
    training.snapshot_freq = 50000
    training.log_freq = 50
    training.eval_freq = 1000
    training.snapshot_freq_for_preemption = 10000
    training.snapshot_sampling = True
    training.likelihood_weighting = False
    training.continuous = True
    training.reduce_mean = False
    training.data_scale = 1

    training.cond_pose_mask_prob = 0.0
    training.cond_part_mask_prob = 0.0
    training.cond_joint_mask_prob = 0.0
    training.cond_3d_prob = 0.0

    config.sampling = sampling = ml_collections.ConfigDict()
    sampling.n_steps_each = 1
    sampling.noise_removal = True
    sampling.probability_flow = False
    sampling.snr = 0.16

    config.eval = evaluate = ml_collections.ConfigDict()
    evaluate.begin_ckpt = 9
    evaluate.end_ckpt = 26
    evaluate.batch_size = 10000
    evaluate.enable_sampling = False
    evaluate.num_samples = 50000
    evaluate.enable_loss = True
    evaluate.enable_bpd = False
    evaluate.bpd_dataset = "test"

    config.data = data = ml_collections.ConfigDict()
    data.dataset = "CIFAR10"
    data.image_size = 32
    data.random_flip = True
    data.centered = False
    data.uniform_dequantization = False
    data.num_channels = 3

    config.model = model = ml_collections.ConfigDict()
    model.sigma_min = 0.01
    model.sigma_max = 50
    model.num_scales = 1000
    model.beta_min = 0.1
    model.beta_max = 20.0
    model.dropout = 0.1
    model.embedding_type = "fourier"

    config.optim = optim = ml_collections.ConfigDict()
    optim.weight_decay = 0
    optim.optimizer = "Adam"
    optim.lr = 2e-4
    optim.beta1 = 0.9
    optim.eps = 1e-8
    optim.warmup = 5000
    optim.grad_clip = 1.0

    config.seed = 42
    config.device = "tpu"
    return config
