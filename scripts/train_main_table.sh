#!/bin/bash
# Main-table parity runs: the reference's tuned hyperparameters
# (train_main_table.sh + hyperparameters.md:41-137 of shyam196/egc)
# expressed against this framework's CLI. Add --real when datasets are
# mounted under DATASET_LOC; default runs use synthetic stand-ins.
set -e
DIR="${1:-./retrained_models}"
RUNS="${RUNS:-10}"
EXTRA="${EXTRA:-}"

run() { python main.py "$@" --final-runs "${RUNS}" ${EXTRA}; }

# ZINC
run "${DIR}/zinc/gatv2" gatv2 zinc --hidden 104 --hparams "{'lr': 0.004492024637681755, 'batch_size': 128, 'wd': 0.00018406568206249198}"
run "${DIR}/zinc/egc_s" egc zinc --hidden 168 --egc-num-heads 8 --egc-num-bases 4 --aggrs symadd --hparams "{'lr': 0.00278434576243951, 'batch_size': 64, 'wd': 0.00015614444389379077}"
run "${DIR}/zinc/egc_m" egc zinc --hidden 124 --egc-num-heads 4 --egc-num-bases 4 --aggrs add,std,max --hparams "{'lr': 0.0019099809690277627, 'batch_size': 64, 'wd': 0.00020407622034162426}"

# CIFAR superpixels
run "${DIR}/cifar/gatv2" gatv2 cifar --hidden 104 --hparams "{'lr': 0.001563799299082841, 'batch_size': 32, 'wd': 0.0003861817258519834, 'dropout': 0.0901933116435249}"
run "${DIR}/cifar/egc_s" egc cifar --hidden 168 --egc-num-heads 8 --egc-num-bases 4 --aggrs symadd --hparams "{'lr': 0.0012354800908953303, 'batch_size': 32, 'wd': 0.000453476392621599, 'dropout': 0.13094687106367725}"
run "${DIR}/cifar/egc_m" egc cifar --hidden 128 --egc-num-heads 4 --egc-num-bases 4 --aggrs symadd,std,max --hparams "{'lr': 0.0009263869626947979, 'batch_size': 32, 'wd': 0.0007592290244995363, 'dropout': 0.08118925150158363}"

# ogbg-molhiv
run "${DIR}/hiv/gcn" gcn hiv --hidden 240 --hparams "{'lr': 0.00031622776601683794, 'batch_size': 32, 'wd': 0.0001, 'dropout': 0.2}"
run "${DIR}/hiv/gat" gat hiv --hidden 240 --hparams "{'lr': 0.00031622776601683794, 'batch_size': 32, 'wd': 0.0001, 'dropout': 0.0}"
run "${DIR}/hiv/gatv2" gatv2 hiv --hidden 184 --hparams "{'lr': 0.00031622776601683794, 'batch_size': 64, 'wd': 0.0001, 'dropout': 0.0}"
run "${DIR}/hiv/gin" gin hiv --hidden 240 --hparams "{'lr': 0.00031622776601683794, 'batch_size': 32, 'wd': 0.0001, 'dropout': 0.2}"
run "${DIR}/hiv/sage" sage hiv --hidden 180 --hparams "{'lr': 0.00031622776601683794, 'batch_size': 64, 'wd': 0.001, 'dropout': 0.2}"
run "${DIR}/hiv/mpnn-max" mpnn-max hiv --hidden 180 --hparams "{'lr': 0.00031622776601683794, 'batch_size': 64, 'wd': 0.0001, 'dropout': 0.0}"
run "${DIR}/hiv/mpnn-sum" mpnn-sum hiv --hidden 180 --hparams "{'lr': 0.0001, 'batch_size': 32, 'wd': 0.001, 'dropout': 0.2}"
run "${DIR}/hiv/egc_s" egc hiv --hidden 296 --egc-num-heads 8 --egc-num-bases 4 --aggrs symadd --hparams "{'lr': 0.0001, 'batch_size': 32, 'wd': 0.0001, 'dropout': 0.2}"
run "${DIR}/hiv/egc_m" egc hiv --hidden 224 --egc-num-heads 4 --egc-num-bases 4 --aggrs add,mean,max --hparams "{'lr': 0.0001, 'batch_size': 32, 'wd': 0.001, 'dropout': 0.2}"

# ogbn-arxiv
run "${DIR}/arxiv/gcn" gcn arxiv --hidden 156 --hparams "{'lr': 0.0023853323044733007, 'wd': 0.0001, 'dropout': 0.2}"
run "${DIR}/arxiv/gat" gat arxiv --hidden 152 --hparams "{'lr': 0.0087876393444041, 'wd': 0.0001, 'dropout': 0.2}"
run "${DIR}/arxiv/gatv2" gatv2 arxiv --hidden 112 --hparams "{'lr': 0.0087876393444041, 'wd': 0.001, 'dropout': 0.2}"
run "${DIR}/arxiv/gin" gin arxiv --hidden 156 --hparams "{'lr': 0.0087876393444041, 'wd': 0.0001, 'dropout': 0.2}"
run "${DIR}/arxiv/sage" sage arxiv --hidden 115 --hparams "{'lr': 0.0023853323044733007, 'wd': 0.001, 'dropout': 0.2}"
run "${DIR}/arxiv/mpnn-max" mpnn-max arxiv --hidden 116 --hparams "{'lr': 0.001, 'wd': 0.001, 'dropout': 0.2}"
run "${DIR}/arxiv/mpnn-sum" mpnn-sum arxiv --hidden 116 --hparams "{'lr': 0.03237394014347626, 'wd': 0.0001, 'dropout': 0.2}"
run "${DIR}/arxiv/pna" pna arxiv --hidden 76 --hparams "{'lr': 0.0036840314986403863, 'wd': 0.001, 'dropout': 0.2}"
run "${DIR}/arxiv/egc_s" egc arxiv --hidden 184 --egc-num-heads 8 --egc-num-bases 4 --aggrs symadd --hparams "{'lr': 0.005689810202763908, 'wd': 0.001, 'dropout': 0.2}"
run "${DIR}/arxiv/egc_m" egc arxiv --hidden 136 --egc-num-heads 4 --egc-num-bases 4 --aggrs symadd,max,mean --hparams "{'lr': 0.0036840314986403863, 'wd': 0.001, 'dropout': 0.2}"

# ogbg-code2
run "${DIR}/code2/gcn" gcn code --hidden 304 --hparams "{'lr': 0.001584893192461114}"
run "${DIR}/code2/gat" gat code --hidden 304 --hparams "{'lr': 0.00025118864315095795}"
run "${DIR}/code2/gatv2" gatv2 code --hidden 296 --hparams "{'lr': 0.00025118864315095795}"
run "${DIR}/code2/gin" gin code --hidden 304 --hparams "{'lr': 0.001584893192461114}"
run "${DIR}/code2/sage" sage code --hidden 293 --hparams "{'lr': 0.000630957344480193}"
run "${DIR}/code2/mpnn-max" mpnn-max code --hidden 292 --hparams "{'lr': 0.000630957344480193}"
run "${DIR}/code2/mpnn-sum" mpnn-sum code --hidden 292 --hparams "{'lr': 0.00025118864315095795}"
run "${DIR}/code2/pna" pna code --hidden 272 --hparams "{'lr': 0.00063096}"
run "${DIR}/code2/egc_s" egc code --hidden 304 --egc-num-heads 8 --egc-num-bases 8 --aggrs symadd --hparams "{'lr': 0.000630957344480193}"
run "${DIR}/code2/egc_m" egc code --hidden 300 --egc-num-heads 4 --egc-num-bases 4 --aggrs symadd,min,max --hparams "{'lr': 0.001584893192461114}"

# ogbn-mag (homogeneous + heterogeneous)
run "${DIR}/mag/mean" egc mag --hidden 352 --egc-num-heads 8 --egc-num-bases 4 --aggrs mean --hparams "{'lr': 0.005, 'wd': 1e-05, 'dropout': 0.3}"
run "${DIR}/mag/symnorm" egc mag --hidden 352 --egc-num-heads 8 --egc-num-bases 4 --aggrs symnorm --hparams "{'lr': 0.01, 'wd': 1e-05, 'dropout': 0.3}"
run "${DIR}/rmag" egc rmag --hidden 64 --egc-num-heads 4 --egc-num-bases 4 --hparams "{'lr': 0.01, 'wd': 0.001, 'dropout': 0.7}"
