#pragma once
#include "QUdpSocket"
