/* dex_policy: dependency-free C runtime for deployed DexHand policies.
 *
 * Loads the flat binary produced by
 *   python -m dexrobot_isaac_tpu.rl.export <ckpt> --format bin
 * and evaluates the deterministic actor:
 *   clip((obs - mean) / std, +-norm_clip) -> MLP(ELU) -> clip(mu, +-1)
 * exactly mirroring PPOLearner.act_deterministic (rl/ppo.py) and
 * NumpyPolicy (rl/export.py). Intended for robot-side control loops where
 * Python is unavailable; a single policy evaluation is a few microseconds.
 *
 * C API (stable, ctypes/FFI-friendly):
 *   dex_policy*  dex_policy_load(const char* path);   NULL on error
 *   int  dex_policy_num_obs(const dex_policy*);
 *   int  dex_policy_num_actions(const dex_policy*);
 *   int  dex_policy_act(const dex_policy*, const float* obs, int batch,
 *                       float* actions_out);          0 on success
 *   void dex_policy_free(dex_policy*);
 */
#ifndef DEX_POLICY_H
#define DEX_POLICY_H

#ifdef __cplusplus
extern "C" {
#endif

typedef struct dex_policy dex_policy;

dex_policy *dex_policy_load(const char *path);
int dex_policy_num_obs(const dex_policy *p);
int dex_policy_num_actions(const dex_policy *p);
/* obs: batch x num_obs row-major; actions_out: batch x num_actions */
int dex_policy_act(const dex_policy *p, const float *obs, int batch,
                   float *actions_out);
void dex_policy_free(dex_policy *p);

#ifdef __cplusplus
}
#endif

#endif /* DEX_POLICY_H */
