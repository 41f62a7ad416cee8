// yolort_tpu C++ serving driver over the PJRT C API.
//
// The reference ships one C++ demo per backend (deployment/libtorch/main.cpp,
// onnxruntime/main.cpp:64-228, tensorrt/main.cpp) each tied to that backend's
// runtime.  On TPU a single driver suffices: dlopen any PJRT plugin
// (libtpu.so on a real TPU host, the axon tunnel plugin here, or a CPU
// plugin), compile the StableHLO program exported by
// yolort_tpu/runtime/aot.py (params baked in as constants), and run the
// full uint8-frames -> detections pipeline with zero Python.
//
// Build:  see CMakeLists.txt (only needs the PJRT C API header + dlfcn).
// Usage:  pjrt_yolo_driver <plugin.so> <program.mlirbc> [batch H W iters]

#include <dlfcn.h>

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <string>
#include <vector>

#include "xla/pjrt/c/pjrt_c_api.h"

#define CHECK_NULL(x, msg)                      \
  if ((x) == nullptr) {                         \
    fprintf(stderr, "FATAL: %s\n", msg);        \
    return 1;                                   \
  }

static const PJRT_Api* g_api = nullptr;

static int check_error(PJRT_Error* err, const char* what) {
  if (err == nullptr) return 0;
  PJRT_Error_Message_Args margs;
  memset(&margs, 0, sizeof(margs));
  margs.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  margs.error = err;
  g_api->PJRT_Error_Message(&margs);
  fprintf(stderr, "PJRT error in %s: %.*s\n", what, (int)margs.message_size,
          margs.message);
  PJRT_Error_Destroy_Args dargs;
  memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
  dargs.error = err;
  g_api->PJRT_Error_Destroy(&dargs);
  return 1;
}

static std::string read_file(const char* path) {
  std::ifstream f(path, std::ios::binary);
  return std::string(std::istreambuf_iterator<char>(f),
                     std::istreambuf_iterator<char>());
}

int main(int argc, char** argv) {
  if (argc < 3) {
    fprintf(stderr,
            "usage: %s <pjrt_plugin.so> <program.mlirbc> [batch=1 h=640 "
            "w=640 iters=10 input.bin dump_prefix]\n",
            argv[0]);
    return 2;
  }
  const char* plugin_path = argv[1];
  const char* program_path = argv[2];
  const int64_t batch = argc > 3 ? atoll(argv[3]) : 1;
  const int64_t height = argc > 4 ? atoll(argv[4]) : 640;
  const int64_t width = argc > 5 ? atoll(argv[5]) : 640;
  const int iters = argc > 6 ? atoi(argv[6]) : 10;
  const char* input_path = argc > 7 ? argv[7] : nullptr;   // raw uint8 NHWC
  const char* dump_prefix = argc > 8 ? argv[8] : nullptr;  // raw output dumps

  // --- load plugin ---------------------------------------------------------
  void* handle = dlopen(plugin_path, RTLD_NOW | RTLD_LOCAL);
  if (handle == nullptr) {
    fprintf(stderr, "dlopen(%s) failed: %s\n", plugin_path, dlerror());
    return 1;
  }
  using GetPjrtApiFn = const PJRT_Api* (*)();
  auto get_api = reinterpret_cast<GetPjrtApiFn>(dlsym(handle, "GetPjrtApi"));
  CHECK_NULL(get_api, "plugin does not export GetPjrtApi");
  g_api = get_api();
  CHECK_NULL(g_api, "GetPjrtApi returned null");
  printf("PJRT plugin api version: %d.%d\n", g_api->pjrt_api_version.major_version,
         g_api->pjrt_api_version.minor_version);

  {
    PJRT_Plugin_Initialize_Args args;
    memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
    if (check_error(g_api->PJRT_Plugin_Initialize(&args), "Plugin_Initialize"))
      return 1;
  }

  // --- create client -------------------------------------------------------
  // Plugins may require NamedValue options; the axon tunnel plugin needs the
  // session/topology parameters its python register() would pass.  Harmless
  // extras are ignored by plugins that don't know them (libtpu, CPU).
  auto sval = [](PJRT_NamedValue& nv, const char* name, const char* v) {
    memset(&nv, 0, sizeof(nv));
    nv.struct_size = PJRT_NamedValue_STRUCT_SIZE;
    nv.name = name;
    nv.name_size = strlen(name);
    nv.type = PJRT_NamedValue_kString;
    nv.string_value = v;
    nv.value_size = strlen(v);
  };
  auto ival = [](PJRT_NamedValue& nv, const char* name, int64_t v) {
    memset(&nv, 0, sizeof(nv));
    nv.struct_size = PJRT_NamedValue_STRUCT_SIZE;
    nv.name = name;
    nv.name_size = strlen(name);
    nv.type = PJRT_NamedValue_kInt64;
    nv.int64_value = v;
    nv.value_size = 1;
  };
  const char* gen = getenv("PALLAS_AXON_TPU_GEN");
  std::string topology = std::string(gen ? gen : "v5e") + ":1x1x1";
  std::string session = "pjrt-driver-" + std::to_string(
      std::chrono::steady_clock::now().time_since_epoch().count());
  const char* remote_compile_env = getenv("PALLAS_AXON_REMOTE_COMPILE");
  int64_t remote_compile = (remote_compile_env && remote_compile_env[0] == '1') ? 1 : 0;

  PJRT_NamedValue opts_nv[7];
  sval(opts_nv[0], "topology", topology.c_str());
  sval(opts_nv[1], "session_id", session.c_str());
  ival(opts_nv[2], "remote_compile", remote_compile);
  ival(opts_nv[3], "local_only", 0);
  ival(opts_nv[4], "priority", 0);
  ival(opts_nv[5], "n_slices", 1);
  ival(opts_nv[6], "rank", (int64_t)0xFFFFFFFFll);

  PJRT_Client* client = nullptr;
  {
    PJRT_Client_Create_Args args;
    memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
    args.create_options = opts_nv;
    args.num_options = 7;
    if (check_error(g_api->PJRT_Client_Create(&args), "Client_Create")) return 1;
    client = args.client;
  }
  CHECK_NULL(client, "client creation returned null");

  PJRT_Device* device = nullptr;
  {
    PJRT_Client_AddressableDevices_Args args;
    memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
    args.client = client;
    if (check_error(g_api->PJRT_Client_AddressableDevices(&args),
                    "AddressableDevices"))
      return 1;
    if (args.num_addressable_devices == 0) {
      fprintf(stderr, "no addressable devices\n");
      return 1;
    }
    device = args.addressable_devices[0];
    printf("addressable devices: %zu\n", args.num_addressable_devices);
  }

  // --- compile the StableHLO program --------------------------------------
  std::string program = read_file(program_path);
  if (program.empty()) {
    fprintf(stderr, "cannot read program %s\n", program_path);
    return 1;
  }
  printf("program: %zu bytes\n", program.size());

  PJRT_Program prog;
  memset(&prog, 0, sizeof(prog));
  prog.struct_size = PJRT_Program_STRUCT_SIZE;
  prog.code = const_cast<char*>(program.data());
  prog.code_size = program.size();
  const char kFormat[] = "mlir";
  prog.format = kFormat;
  prog.format_size = sizeof(kFormat) - 1;

  // hand-encoded CompileOptionsProto: executable_build_options (field 3)
  // { num_replicas (field 4) = 1, num_partitions (field 5) = 1 }
  const unsigned char compile_options[] = {0x1A, 0x04, 0x20, 0x01, 0x28, 0x01};

  PJRT_LoadedExecutable* exec = nullptr;
  {
    PJRT_Client_Compile_Args args;
    memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
    args.client = client;
    args.program = &prog;
    args.compile_options = reinterpret_cast<const char*>(compile_options);
    args.compile_options_size = sizeof(compile_options);
    auto t0 = std::chrono::steady_clock::now();
    if (check_error(g_api->PJRT_Client_Compile(&args), "Client_Compile"))
      return 1;
    exec = args.executable;
    double dt = std::chrono::duration<double>(std::chrono::steady_clock::now() - t0).count();
    printf("compiled in %.1f s\n", dt);
  }

  // --- stage input buffer (uint8 NHWC frames) ------------------------------
  std::vector<uint8_t> host_input(batch * height * width * 3, 114);
  if (input_path != nullptr) {
    std::string raw = read_file(input_path);
    if (raw.size() != host_input.size()) {
      fprintf(stderr, "input %s is %zu bytes, expected %zu\n", input_path,
              raw.size(), host_input.size());
      return 1;
    }
    memcpy(host_input.data(), raw.data(), raw.size());
    printf("input: %s\n", input_path);
  }
  const int64_t dims[4] = {batch, height, width, 3};

  PJRT_Buffer* input = nullptr;
  {
    PJRT_Client_BufferFromHostBuffer_Args args;
    memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
    args.client = client;
    args.data = host_input.data();
    args.type = PJRT_Buffer_Type_U8;
    args.dims = dims;
    args.num_dims = 4;
    args.host_buffer_semantics =
        PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
    args.device = device;
    if (check_error(g_api->PJRT_Client_BufferFromHostBuffer(&args),
                    "BufferFromHostBuffer"))
      return 1;
    if (args.done_with_host_buffer) {
      PJRT_Event_Await_Args eargs;
      memset(&eargs, 0, sizeof(eargs));
      eargs.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
      eargs.event = args.done_with_host_buffer;
      check_error(g_api->PJRT_Event_Await(&eargs), "Event_Await(h2d)");
      PJRT_Event_Destroy_Args dargs;
      memset(&dargs, 0, sizeof(dargs));
      dargs.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
      dargs.event = args.done_with_host_buffer;
      g_api->PJRT_Event_Destroy(&dargs);
    }
    input = args.buffer;
  }

  // --- execute -------------------------------------------------------------
  PJRT_ExecuteOptions opts;
  memset(&opts, 0, sizeof(opts));
  opts.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;

  // outputs: boxes (B,300,4) f32, scores (B,300) f32, labels (B,300) i32,
  // num (B,) i32 — 4 outputs per device.
  const int kNumOutputs = 4;
  std::vector<PJRT_Buffer*> output_storage(kNumOutputs, nullptr);

  double total = 0.0;
  for (int it = 0; it < iters; ++it) {
    PJRT_Buffer* arg_list[1] = {input};
    PJRT_Buffer* const* arg_lists[1] = {arg_list};
    PJRT_Buffer** out_list = output_storage.data();
    PJRT_Buffer*** out_lists = &out_list;
    PJRT_Event* device_complete = nullptr;

    PJRT_LoadedExecutable_Execute_Args args;
    memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
    args.executable = exec;
    args.options = &opts;
    args.num_devices = 1;
    args.num_args = 1;
    args.argument_lists = arg_lists;
    args.output_lists = out_lists;
    args.device_complete_events = &device_complete;
    args.execute_device = device;

    auto t0 = std::chrono::steady_clock::now();
    if (check_error(g_api->PJRT_LoadedExecutable_Execute(&args), "Execute"))
      return 1;
    if (device_complete) {
      PJRT_Event_Await_Args eargs;
      memset(&eargs, 0, sizeof(eargs));
      eargs.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
      eargs.event = device_complete;
      check_error(g_api->PJRT_Event_Await(&eargs), "Event_Await(exec)");
      PJRT_Event_Destroy_Args dargs;
      memset(&dargs, 0, sizeof(dargs));
      dargs.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
      dargs.event = device_complete;
      g_api->PJRT_Event_Destroy(&dargs);
    }
    double dt = std::chrono::duration<double>(std::chrono::steady_clock::now() - t0).count();
    if (it > 0) total += dt;  // skip warmup
    // destroy previous outputs except after last iter
    if (it != iters - 1) {
      for (int i = 0; i < kNumOutputs; ++i) {
        if (output_storage[i]) {
          PJRT_Buffer_Destroy_Args bd;
          memset(&bd, 0, sizeof(bd));
          bd.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
          bd.buffer = output_storage[i];
          g_api->PJRT_Buffer_Destroy(&bd);
          output_storage[i] = nullptr;
        }
      }
    }
  }
  if (iters > 1) {
    double per_iter = total / (iters - 1);
    printf("mean latency: %.3f ms, throughput: %.1f imgs/sec\n",
           per_iter * 1000.0, batch / per_iter);
  }

  // --- fetch outputs --------------------------------------------------------
  auto fetch = [&](PJRT_Buffer* buf, void* dst, size_t bytes) -> int {
    PJRT_Buffer_ToHostBuffer_Args args;
    memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
    args.src = buf;
    args.dst = dst;
    args.dst_size = bytes;
    if (check_error(g_api->PJRT_Buffer_ToHostBuffer(&args), "ToHostBuffer"))
      return 1;
    if (args.event) {
      PJRT_Event_Await_Args eargs;
      memset(&eargs, 0, sizeof(eargs));
      eargs.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
      eargs.event = args.event;
      if (check_error(g_api->PJRT_Event_Await(&eargs), "Event_Await(d2h)"))
        return 1;
      PJRT_Event_Destroy_Args dargs;
      memset(&dargs, 0, sizeof(dargs));
      dargs.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
      dargs.event = args.event;
      g_api->PJRT_Event_Destroy(&dargs);
    }
    return 0;
  };

  std::vector<int32_t> num_dets(batch, -1);
  if (output_storage[3] != nullptr &&
      fetch(output_storage[3], num_dets.data(), num_dets.size() * sizeof(int32_t)) == 0) {
    printf("detections per image:");
    for (int64_t i = 0; i < batch; ++i) printf(" %d", num_dets[i]);
    printf("\n");
  }

  // full-output dump for the numerical-parity gate (smoke.sh step 4: the
  // reference's deployed-backend contract compares boxes/scores/labels at
  // 1e-3/1e-5, test/test_runtime_ort.py:44-59)
  if (dump_prefix != nullptr) {
    const int64_t kMaxDet = 300;
    std::vector<float> boxes(batch * kMaxDet * 4), scores(batch * kMaxDet);
    std::vector<int32_t> labels(batch * kMaxDet);
    auto dump = [&](const char* suffix, const void* data, size_t bytes) {
      std::string p = std::string(dump_prefix) + suffix;
      std::ofstream f(p, std::ios::binary);
      f.write(reinterpret_cast<const char*>(data), bytes);
      printf("dumped %s (%zu bytes)\n", p.c_str(), bytes);
    };
    if (fetch(output_storage[0], boxes.data(), boxes.size() * sizeof(float)) == 0)
      dump(".boxes.f32", boxes.data(), boxes.size() * sizeof(float));
    if (fetch(output_storage[1], scores.data(), scores.size() * sizeof(float)) == 0)
      dump(".scores.f32", scores.data(), scores.size() * sizeof(float));
    if (fetch(output_storage[2], labels.data(), labels.size() * sizeof(int32_t)) == 0)
      dump(".labels.i32", labels.data(), labels.size() * sizeof(int32_t));
    dump(".num.i32", num_dets.data(), num_dets.size() * sizeof(int32_t));
  }

  printf("ok\n");
  return 0;
}
