#pragma once
#include "QMutex"
